"""Context-Aware Classifier segmentor (CAC-v1m1), TPU-native.

Re-design of the reference CAC
(pointcept/models/context_aware_classifier/context_aware_classifier_v1m1_base.py:16-280)
for padded batches:

  - per-scene offset loops (post_refine_proto_batch, l.103-150) become one
    batched einsum: soft predictions pool per-scene class prototypes.
  - get_adaptive_perspective's per-class feature means (l.76-100) use masked
    one-hot matmuls over the whole batch (like the reference, which pools
    over the packed buffer without offset splits).
  - the class-entropy-weighted distillation loss (l.152-200) computes all
    class terms with segment sums over the class axis; absent classes drop
    out of the average.

Training losses live in-model (task="cac"); eval returns refined logits.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .builder import MODELS, build_model
from .losses.builder import build_criteria
from .structure import PointBatch


def _l2n(x, axis=-1, eps=1e-12):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


@MODELS.register_module("CAC-v1m1")
class CACSegmentor(nn.Module):
    num_classes: int
    backbone_out_channels: int
    backbone: dict
    criteria: Optional[Tuple[dict, ...]] = None
    cos_temp: float = 15.0
    main_weight: float = 1.0
    pre_weight: float = 1.0
    pre_self_weight: float = 1.0
    kl_weight: float = 1.0
    conf_thresh: float = 0.0
    detach_pre_logits: bool = False

    def setup(self):
        c = self.backbone_out_channels
        self.backbone_module = build_model(dict(self.backbone))
        # own the seg-head params: the prototype matrix doubles as the class
        # embedding (reference uses seg_head.weight directly, l.226-236)
        self.seg_kernel = self.param(
            "seg_kernel", nn.initializers.lecun_normal(),
            (c, self.num_classes), jnp.float32,
        )
        self.seg_bias = self.param(
            "seg_bias", nn.initializers.zeros, (self.num_classes,), jnp.float32
        )
        self.proj_fc1 = nn.Dense(2 * c, use_bias=False)
        self.proj_fc2 = nn.Dense(c)
        self.apd_fc1 = nn.Dense(2 * c, use_bias=False)
        self.apd_fc2 = nn.Dense(c)
        self.feat_fc1 = nn.Dense(c, use_bias=False)
        self.feat_norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.feat_fc2 = nn.Dense(c)
        self.criteria_fn = build_criteria(
            [dict(c) for c in self.criteria] if self.criteria else None
        )

    def _proj(self, x):
        return self.proj_fc2(nn.relu(self.proj_fc1(x)))

    def _apd_proj(self, x):
        return self.apd_fc2(nn.relu(self.apd_fc1(x)))

    def _feat_proj(self, x, train):
        x = self.feat_fc1(x)
        x = nn.relu(self.feat_norm(x, use_running_average=not train))
        return self.feat_fc2(x)

    @staticmethod
    def get_pred(x, proto):
        """Cosine scores (reference l.66-72). x [..., C]; proto [..., cls, C]."""
        return jnp.einsum("...nc,...kc->...nk", _l2n(x), _l2n(proto))

    def post_refine_proto_batch(self, feat, pred, proto, mask, train):
        """Per-scene soft prototypes refine the prediction (reference
        l.103-150) — one batched einsum replaces the offset loop."""
        if self.detach_pre_logits:
            pred = jax.lax.stop_gradient(pred)
        w = mask.astype(jnp.float32)[..., None]
        soft = jax.nn.softmax(pred.astype(jnp.float32), axis=-1) * w  # [B,N,cls]
        if self.conf_thresh > 0:
            keep = (soft.max(-1, keepdims=True) >= self.conf_thresh).astype(soft.dtype)
            soft = soft * keep
        denom = soft.sum(axis=1)[..., None] + 1e-7  # [B, cls, 1]
        pred_proto = jnp.einsum("bnk,bnc->bkc", soft, feat.astype(jnp.float32)) / denom
        pred_proto = jnp.concatenate(
            [pred_proto, jnp.broadcast_to(proto, pred_proto.shape)], axis=-1
        )
        pred_proto = self._proj(pred_proto)
        x = self._feat_proj(feat, train)
        return self.get_pred(x, pred_proto)

    def get_adaptive_perspective(self, feat, target, new_proto, proto, mask, train):
        """Replace prototypes of present classes with their batch feature
        means (reference l.76-100)."""
        valid = (mask & (target >= 0)).astype(jnp.float32)
        onehot = jax.nn.one_hot(jnp.maximum(target, 0), self.num_classes) * valid[..., None]
        counts = onehot.sum(axis=(0, 1))  # [cls]
        sums = jnp.einsum("bnk,bnc->kc", onehot, feat.astype(jnp.float32))
        means = sums / (counts[:, None] + 1e-4)
        present = (counts > 0)[:, None]
        new_proto = jnp.where(present, means, new_proto)
        new_proto = jnp.concatenate([new_proto, proto], axis=-1)
        new_proto = self._apd_proj(new_proto)
        x = self._feat_proj(feat, train)
        return self.get_pred(x, new_proto)

    def get_distill_loss(self, pred, soft, target, mask, smoothness=0.5, eps=0.0):
        """Class-entropy-weighted distillation (reference l.152-200)."""
        soft = jax.lax.stop_gradient(soft.astype(jnp.float32))
        pred = pred.astype(jnp.float32)
        valid = mask & (target >= 0)
        sm_soft = jax.nn.softmax(soft, axis=-1)
        onehot = jax.nn.one_hot(jnp.maximum(target, 0), self.num_classes)
        onehot = onehot * valid[..., None].astype(jnp.float32)
        smoothed = smoothness * sm_soft + (1 - smoothness) * onehot
        if eps > 0:
            smoothed = smoothed * (1 - eps) + (1 - smoothed) * eps / (
                self.num_classes - 1
            )
        loss_pt = -(jax.nn.log_softmax(pred, axis=-1) * smoothed).sum(-1)  # [B,N]
        entropy = -(sm_soft * jnp.log(sm_soft + 1e-4)).sum(-1)
        entropy = entropy * valid.astype(jnp.float32)
        # per-class entropy-weighted means, averaged over present classes
        cls_weight = jnp.einsum("bnk,bn->k", onehot, entropy)  # sum entropy per cls
        cls_loss = jnp.einsum("bnk,bn->k", onehot, loss_pt * entropy)
        per_cls = cls_loss / (cls_weight + 1e-4)
        present = (onehot.sum(axis=(0, 1)) > 0).astype(jnp.float32)
        return (per_cls * present).sum() / (present.sum() + 1e-4)

    def __call__(self, point: PointBatch, train: bool = False, segment=None):
        out = self.backbone_module(point, train=train)
        feat = out.feat
        seg_logits = feat @ self.seg_kernel.astype(feat.dtype) + self.seg_bias.astype(feat.dtype)
        proto = self.seg_kernel.T  # [cls, C]

        if self.is_initializing():
            # the adaptive-perspective branch only runs in training; touch it
            # so init (eval path) creates its params
            self._apd_proj(jnp.zeros((1, 2 * self.backbone_out_channels)))

        if not train or segment is None:
            refined = self.post_refine_proto_batch(
                feat, seg_logits, proto, out.mask, train
            ) * self.cos_temp
            return out.replace(feat=refined)

        refine_logits = self.post_refine_proto_batch(
            feat, seg_logits, proto, out.mask, train
        ) * self.cos_temp
        cac_pred = self.get_adaptive_perspective(
            feat, segment, jax.lax.stop_gradient(proto), proto, out.mask, train
        ) * self.cos_temp

        crit = self.criteria_fn
        seg_loss = crit(refine_logits, segment, mask=out.mask) * self.main_weight
        pre_loss = crit(cac_pred, segment, mask=out.mask) * self.pre_weight
        pre_self_loss = crit(seg_logits, segment, mask=out.mask) * self.pre_self_weight
        kl_loss = self.get_distill_loss(
            refine_logits, jax.lax.stop_gradient(cac_pred), segment, out.mask
        ) * self.kl_weight
        loss = seg_loss + pre_loss + pre_self_loss + kl_loss
        return {
            "loss": loss,
            "seg_loss": seg_loss,
            "pre_loss": pre_loss,
            "pre_self_loss": pre_self_loss,
            "kl_loss": kl_loss,
        }
