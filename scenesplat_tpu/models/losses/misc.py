"""Core losses, mask-aware for padded batches.

Semantics match the reference losses (pointcept/models/losses/misc.py) with
explicit validity masks instead of boolean indexing (fixed shapes for jit).
All losses accept flattened or [B, N, ...] inputs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(values.dtype)
    return (values * m).sum() / jnp.maximum(m.sum(), 1.0)


def _one_hot_smooth(labels, num_classes, smoothing):
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    oh = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes)
    return oh * on + (1.0 - oh) * off


@LOSSES.register_module()
class CrossEntropyLoss:
    """CE over valid, non-ignored points (reference misc.py:14-42)."""

    def __init__(
        self,
        weight: Optional[Sequence[float]] = None,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        loss_weight: float = 1.0,
        ignore_index: int = -1,
    ):
        self.weight = None if weight is None else jnp.asarray(weight)
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None, **kwargs):
        num_classes = pred.shape[-1]
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        if self.label_smoothing > 0:
            tgt = _one_hot_smooth(target, num_classes, self.label_smoothing)
            nll = -(tgt * logp).sum(-1)
        else:
            safe_t = jnp.clip(target, 0, num_classes - 1)
            nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
        if self.weight is not None:
            w = self.weight[jnp.clip(target, 0, num_classes - 1)]
            nll = nll * w
            denom = (w * valid).sum()
            loss = (nll * valid).sum() / jnp.maximum(denom, 1e-12)
        elif self.reduction == "mean":
            loss = _masked_mean(nll, valid)
        else:
            loss = (nll * valid).sum()
        return self.loss_weight * loss


@LOSSES.register_module()
class SmoothCELoss:
    """Label-smoothed CE (reference misc.py:45-80; the reference's ``.total``
    call is a latent crash bug — implemented correctly here)."""

    def __init__(self, smoothing_ratio: float = 0.1, loss_weight: float = 1.0,
                 ignore_index: int = -1):
        self.smoothing_ratio = smoothing_ratio
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None, **kwargs):
        num_classes = pred.shape[-1]
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        tgt = _one_hot_smooth(target, num_classes, self.smoothing_ratio)
        logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
        nll = -(tgt * logp).sum(-1)
        return self.loss_weight * _masked_mean(nll, valid)


@LOSSES.register_module()
class FocalLoss:
    """Multi-class focal loss (reference misc.py:83-140)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.5,
                 reduction: str = "mean", loss_weight: float = 1.0,
                 ignore_index: int = -1):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None, **kwargs):
        # sigmoid (one-vs-all) focal loss over one-hot targets, element-mean
        # across the [N_valid, C] matrix — matching the reference exactly
        # (misc.py:144-193; golden-tested in tests/test_losses_golden.py)
        num_classes = pred.shape[-1]
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        pred = pred.astype(jnp.float32).reshape(-1, num_classes)
        valid = valid.reshape(-1)
        safe_t = jnp.clip(target.reshape(-1), 0, num_classes - 1)
        t = jax.nn.one_hot(safe_t, num_classes, dtype=jnp.float32)
        alpha = jnp.asarray(self.alpha, jnp.float32)
        p = jax.nn.sigmoid(pred)
        one_minus_pt = (1 - p) * t + p * (1 - t)
        focal_w = (alpha * t + (1 - alpha) * (1 - t)) * one_minus_pt**self.gamma
        # numerically-stable BCE-with-logits
        bce = jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        per_el = bce * focal_w * valid[:, None]
        if self.reduction == "mean":
            loss = per_el.sum() / jnp.maximum(valid.sum() * num_classes, 1)
        else:  # reference "sum" crashes on Tensor.total; correct sum here
            loss = per_el.sum()
        return self.loss_weight * loss


@LOSSES.register_module()
class BinaryFocalLoss:
    """Binary focal loss on logits (reference misc.py:143-195)."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25,
                 logits: bool = True, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.logits = logits
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, mask=None, **kwargs):
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.logits:
            p = jax.nn.sigmoid(pred)
            bce = jnp.maximum(pred, 0) - pred * target + jnp.log1p(
                jnp.exp(-jnp.abs(pred))
            )
        else:
            p = pred
            bce = -(target * jnp.log(p + 1e-12) + (1 - target) * jnp.log(1 - p + 1e-12))
        pt = p * target + (1 - p) * (1 - target)
        at = self.alpha * target + (1 - self.alpha) * (1 - target)
        focal = at * (1 - pt) ** self.gamma * bce
        valid = jnp.ones(focal.shape, bool) if mask is None else mask
        if self.reduction == "mean":
            loss = _masked_mean(focal, valid)
        else:
            loss = (focal * valid).sum()
        return self.loss_weight * loss


@LOSSES.register_module()
class DiceLoss:
    """Soft dice over classes (reference misc.py:198-244)."""

    def __init__(self, smooth: float = 1.0, exponent: float = 2.0,
                 loss_weight: float = 1.0, ignore_index: int = -1):
        self.smooth = smooth
        self.exponent = exponent
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None, **kwargs):
        num_classes = pred.shape[-1]
        valid = target != self.ignore_index
        if mask is not None:
            valid = valid & mask
        prob = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        prob = prob * valid[..., None]
        oh = jax.nn.one_hot(jnp.clip(target, 0, num_classes - 1), num_classes)
        oh = oh * valid[..., None]
        total = 0.0
        for c in range(num_classes):
            if c == self.ignore_index:
                continue
            num = (prob[..., c] * oh[..., c]).sum() * 2 + self.smooth
            den = (prob[..., c] ** self.exponent + oh[..., c] ** self.exponent).sum() + self.smooth
            total = total + (1 - num / den)
        return self.loss_weight * total / num_classes


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, mask=None, **kwargs):
        err = jnp.abs(pred - target)
        valid = jnp.ones(err.shape, bool) if mask is None else (
            mask[..., None] if mask.ndim < err.ndim else mask
        )
        if self.reduction == "mean":
            loss = _masked_mean(err, valid)
        else:
            loss = (err * valid).sum()
        return self.loss_weight * loss


@LOSSES.register_module()
class CosineSimilarity:
    """1 - cos(pred, target) over valid features — the primary VL loss
    (reference misc.py:247-270)."""

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, valid_feat_mask=None, mask=None, **kwargs):
        pf = pred.astype(jnp.float32)
        tf = target.astype(jnp.float32)
        cos = (pf * tf).sum(-1) / (
            jnp.linalg.norm(pf, axis=-1) * jnp.linalg.norm(tf, axis=-1) + 1e-8
        )
        loss = 1.0 - cos
        valid = jnp.ones(loss.shape, bool)
        if valid_feat_mask is not None:
            valid = valid & valid_feat_mask.astype(bool)
        if mask is not None:
            valid = valid & mask
        if self.reduction == "mean":
            out = _masked_mean(loss, valid)
        else:
            out = (loss * valid).sum()
        return self.loss_weight * out


@LOSSES.register_module()
class L2Loss:
    """Per-point squared-error sum over channels, averaged over valid points
    (reference misc.py:273-295)."""

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, valid_feat_mask=None, mask=None, **kwargs):
        err = ((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2).sum(-1)
        valid = jnp.ones(err.shape, bool)
        if valid_feat_mask is not None:
            valid = valid & valid_feat_mask.astype(bool)
        if mask is not None:
            valid = valid & mask
        if self.reduction == "mean":
            out = _masked_mean(err, valid)
        else:
            out = (err * valid).sum()
        return self.loss_weight * out
