"""Point Prompt Training (PPT), TPU-native.

Re-design of the reference PPT heads
(pointcept/models/point_prompt_training/point_prompt_training_v1m1_language_guided.py:15-175,
point_prompt_training_v1m2_decoupled.py:15-77): multi-dataset training with
a per-dataset context embedding fed into PDNorm-conditioned backbones
(SpUNet-v1m3 here), plus either

  - v1m1: language-driven categorical alignment — project features into the
    text-embedding space and score against the dataset's valid classes.
    The reference embeds class names with CLIP at init (l.116-131); in this
    zero-egress build, text embeddings are loaded from a precomputed .npy
    (``class_embedding_path``, same pipeline as scripts/encode_labels.py) or
    initialized as learnable rows when absent.
  - v1m2: one decoupled linear seg head per dataset.

The dataset condition is a traced scalar index (the reference asserts one
condition per batch, l.134); padding logits of non-valid classes with -inf
keeps shapes static across conditions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .builder import MODELS, build_model
from .structure import PointBatch


@MODELS.register_module("PPT-v1m1")
class PointPromptTraining(nn.Module):
    """Language-guided PPT (reference v1m1)."""

    backbone: dict
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Tuple[str, ...] = ("Structured3D", "ScanNet", "S3DIS")
    class_name: Tuple[str, ...] = ()
    valid_index: Tuple[Tuple[int, ...], ...] = ()
    class_embedding_path: Optional[str] = None
    text_channels: int = 512  # CLIP ViT-B/16 text dim
    backbone_mode: bool = False

    def setup(self):
        assert len(self.conditions) == len(self.valid_index)
        self.backbone_module = build_model(dict(self.backbone))
        self.embedding_table = nn.Embed(len(self.conditions), self.context_channels)
        if not self.backbone_mode:
            n_cls = len(self.class_name)
            if self.class_embedding_path:
                emb = np.load(self.class_embedding_path).astype(np.float32)
                assert emb.shape[0] == n_cls
                self.class_embedding = self.variable(
                    "constants", "class_embedding", lambda: jnp.asarray(emb)
                )
                text_c = emb.shape[1]
            else:
                self.class_embedding = self.variable(
                    "constants", "class_embedding",
                    lambda: jnp.asarray(
                        np.random.default_rng(0).normal(
                            0, 0.02, (n_cls, self.text_channels)
                        ).astype(np.float32)
                    ),
                )
                text_c = self.text_channels
            self.proj_head = nn.Dense(text_c)
            # CLIP logit_scale init: log(1/0.07)
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
            )
            # static per-condition class-id table, padded to the max count:
            # the reference SLICES the embedding to valid_index[condition]
            # (v1m1 l.157-161), so logits — and segment labels — live in the
            # condition's LOCAL class space. [C, max_k] gather ids + counts.
            max_k = max(len(ix) for ix in self.valid_index)
            gids = np.zeros((len(self.conditions), max_k), np.int32)
            counts = np.zeros((len(self.conditions),), np.int32)
            for ci, idxs in enumerate(self.valid_index):
                gids[ci, : len(idxs)] = list(idxs)
                counts[ci] = len(idxs)
            self.class_gather_ids = jnp.asarray(gids)
            self.class_counts = jnp.asarray(counts)

    def __call__(self, point: PointBatch, condition_index, train: bool = False):
        context = self.embedding_table(
            jnp.broadcast_to(condition_index, (point.batch_size,))
        )
        out = self.backbone_module(
            point, train=train, condition_index=condition_index, context=context
        )
        if self.backbone_mode:
            return out
        feat = self.proj_head(out.feat)
        feat = feat / (
            jnp.linalg.norm(feat.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8
        )
        emb = self.class_embedding.value
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        sim = feat.astype(jnp.float32) @ emb.T  # [B, N, n_cls]
        logits = jnp.exp(self.logit_scale) * sim
        # LOCAL class space (reference v1m1 l.157-161): gather the
        # condition's classes, fixed-shape padded to max_k with -inf tail —
        # segment labels index into valid_index[condition] like the reference
        sel = jnp.take(self.class_gather_ids, condition_index, axis=0)
        logits = jnp.take(logits, sel, axis=-1)  # [B, N, max_k]
        k_valid = jnp.take(self.class_counts, condition_index)
        slot = jnp.arange(sel.shape[-1])
        logits = jnp.where(slot < k_valid, logits, -1e9)
        return out.replace(feat=logits)


@MODELS.register_module("PPT-v1m2")
class PointPromptTrainingDecoupled(nn.Module):
    """Decoupled-head PPT (reference v1m2): one seg head per dataset; heads
    are padded to max(num_classes) and invalid logits masked."""

    backbone: dict
    backbone_out_channels: int = 96
    context_channels: int = 256
    conditions: Tuple[str, ...] = ("Structured3D", "ScanNet", "S3DIS")
    num_classes: Tuple[int, ...] = (25, 20, 13)
    backbone_mode: bool = False

    def setup(self):
        assert len(self.conditions) == len(self.num_classes)
        self.backbone_module = build_model(dict(self.backbone))
        self.embedding_table = nn.Embed(len(self.conditions), self.context_channels)
        self.max_classes = max(self.num_classes)
        self.seg_heads = [
            nn.Dense(self.max_classes, name=f"seg_head{i}")
            for i in range(len(self.conditions))
        ]

    def __call__(self, point: PointBatch, condition_index, train: bool = False):
        context = self.embedding_table(
            jnp.broadcast_to(condition_index, (point.batch_size,))
        )
        out = self.backbone_module(
            point, train=train, condition_index=condition_index, context=context
        )
        if self.backbone_mode:
            return out
        logits_all = jnp.stack(
            [head(out.feat) for head in self.seg_heads]
        )  # [C, B, N, max_cls]
        logits = jnp.take(logits_all, condition_index, axis=0)
        counts = jnp.asarray(self.num_classes, jnp.int32)
        n_valid = jnp.take(counts, condition_index)
        cls_iota = jnp.arange(self.max_classes)
        logits = jnp.where(cls_iota < n_valid, logits, -1e9)
        return out.replace(feat=logits)
