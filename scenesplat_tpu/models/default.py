"""Task heads (reference: pointcept/models/default.py).

On TPU the "chunked forward" escape hatch of the reference LangPretrainer
(models/default.py:115-176) is unnecessary at train time — the padded layout
already bounds memory — but remains available for very large eval scenes via
the tester's fragment loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.segops import masked_mean_pool
from .builder import MODELS, build_model
from .losses.builder import build_criteria
from .structure import PointBatch


def _l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


@MODELS.register_module()
class LangPretrainer(nn.Module):
    """Backbone + L2-normalized per-Gaussian language features
    (reference models/default.py:77-176)."""

    backbone: dict

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))

    def __call__(self, point: PointBatch, train: bool = False,
                 geometry=None) -> PointBatch:
        if geometry is not None:
            out = self.backbone_module(point, train=train, geometry=geometry)
        else:
            out = self.backbone_module(point, train=train)
        return out.replace(feat=_l2_normalize(out.feat, axis=-1))


@MODELS.register_module()
class DefaultSegmentorV2(nn.Module):
    """Backbone + linear seg head (reference models/default.py:37-74)."""

    num_classes: int
    backbone_out_channels: int
    backbone: dict

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        if self.num_classes > 0:
            self.seg_head = nn.Dense(self.num_classes)

    def __call__(self, point: PointBatch, train: bool = False,
                 geometry=None):
        if geometry is not None:
            out = self.backbone_module(point, train=train, geometry=geometry)
        else:
            out = self.backbone_module(point, train=train)
        logits = self.seg_head(out.feat) if self.num_classes > 0 else out.feat
        return out.replace(feat=logits)


@MODELS.register_module()
class DefaultClassifier(nn.Module):
    """Backbone + global mean pool + MLP head (reference models/default.py:229-278)."""

    backbone: dict
    num_classes: int = 40
    backbone_embed_dim: int = 256

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.fc1 = nn.Dense(256)
        self.fc2 = nn.Dense(128)
        self.fc3 = nn.Dense(self.num_classes)

    def __call__(self, point: PointBatch, train: bool = False):
        out = self.backbone_module(point, train=train)
        pooled = masked_mean_pool(out.feat, out.mask)
        x = nn.relu(self.fc1(pooled))
        x = nn.relu(self.fc2(x))
        return self.fc3(x)


@MODELS.register_module()
class DefaultSegmentor(nn.Module):
    """v1 segmentor: the backbone itself emits logits (reference
    models/default.py:11-33); kept for registry parity with backbones that
    end in a classification layer."""

    backbone: dict

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))

    def __call__(self, point: PointBatch, train: bool = False):
        return self.backbone_module(point, train=train)


@MODELS.register_module()
class DefaultSegmentorSkip(nn.Module):
    """Backbone + deep MLP seg head (reference models/default.py:179-226)."""

    num_classes: int
    backbone_out_channels: int
    backbone: dict

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        self.fc1 = nn.Dense(256)
        self.ln1 = nn.LayerNorm(epsilon=1e-5)
        self.fc2 = nn.Dense(128)
        self.ln2 = nn.LayerNorm(epsilon=1e-5)
        self.fc3 = nn.Dense(self.num_classes)

    def __call__(self, point: PointBatch, train: bool = False):
        out = self.backbone_module(point, train=train)
        x = nn.relu(self.ln1(self.fc1(out.feat)))
        x = nn.relu(self.ln2(self.fc2(x)))
        return out.replace(feat=self.fc3(x))


@MODELS.register_module()
class DefaultPretrainer(nn.Module):
    """Backbone features supervised against precomputed CLIP features
    (reference models/default.py:281-319)."""

    backbone: dict

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))

    def __call__(self, point: PointBatch, train: bool = False):
        return self.backbone_module(point, train=train)
