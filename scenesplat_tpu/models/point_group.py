"""PointGroup instance segmentation (PG-v1m1), TPU-native.

Re-design of the reference PointGroup
(pointcept/models/point_group/point_group_v1m1_base.py:23-178):

  - backbone + semantic head + center-bias head run on device (padded
    batches); the three training losses (CE + bias L1 + bias cosine,
    reference l.72-90) are a pure function wired into the train step
    (task="insseg").
  - proposal clustering (reference pointgroup_ops ballquery_batch_p +
    bfs_cluster, l.100-137 — run on *CPU* in the reference too) is the native
    host op ``native.pointgroup_cluster`` (C++ grid-hash union-find with a
    scipy fallback), invoked at eval time by the instance evaluator.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .builder import MODELS, build_model
from .norm import MaskedBatchNorm
from .structure import PointBatch


@MODELS.register_module("PG-v1m1")
class PointGroup(nn.Module):
    """Backbone + seg/bias heads (reference point_group_v1m1_base.py:23-58)."""

    backbone: dict
    backbone_out_channels: int = 64
    semantic_num_classes: int = 20
    semantic_ignore_index: int = -1
    segment_ignore_index: Tuple[int, ...] = (-1, 0, 1)
    instance_ignore_index: int = -1
    cluster_thresh: float = 1.5
    cluster_closed_points: int = 300
    cluster_propose_points: int = 100
    cluster_min_points: int = 50
    voxel_size: float = 0.02

    def setup(self):
        self.backbone_module = build_model(dict(self.backbone))
        c = self.backbone_out_channels
        self.bias_fc1 = nn.Dense(c)
        self.bias_norm = MaskedBatchNorm(c)
        self.bias_fc2 = nn.Dense(3)
        self.seg_head = nn.Dense(self.semantic_num_classes)

    def __call__(self, point: PointBatch, train: bool = False):
        out = self.backbone_module(point, train=train)
        x = self.bias_fc1(out.feat)
        x = nn.relu(self.bias_norm(x, out.mask, use_running_average=not train))
        bias_pred = self.bias_fc2(x)
        logits = self.seg_head(out.feat)
        return out.replace(feat=logits), bias_pred


def pointgroup_loss(
    logits: jnp.ndarray,
    bias_pred: jnp.ndarray,
    coord: jnp.ndarray,
    segment: jnp.ndarray,
    instance: jnp.ndarray,
    instance_centroid: jnp.ndarray,
    mask: jnp.ndarray,
    criteria=None,
    instance_ignore_index: int = -1,
):
    """CE + bias L1 + bias cosine (reference point_group_v1m1_base.py:72-95).

    Returns (total_loss, aux_dict). ``criteria`` handles the semantic CE term
    (configurable like every other task); the two bias terms are fixed.
    """
    if criteria is not None:
        seg_loss = criteria(logits, segment, mask=mask)
    else:
        seg_loss = jnp.asarray(0.0)

    w = ((instance != instance_ignore_index) & mask).astype(jnp.float32)
    bias_gt = (instance_centroid - coord).astype(jnp.float32)
    bp = bias_pred.astype(jnp.float32)
    denom = jnp.sum(w) + 1e-8

    l1 = jnp.sum(jnp.abs(bp - bias_gt), axis=-1)
    bias_l1_loss = jnp.sum(l1 * w) / denom

    bp_n = bp / (jnp.linalg.norm(bp, axis=-1, keepdims=True) + 1e-8)
    gt_n = bias_gt / (jnp.linalg.norm(bias_gt, axis=-1, keepdims=True) + 1e-8)
    cos = -jnp.sum(bp_n * gt_n, axis=-1)
    bias_cosine_loss = jnp.sum(cos * w) / denom

    total = seg_loss + bias_l1_loss + bias_cosine_loss
    return total, {
        "seg_loss": seg_loss,
        "bias_l1_loss": bias_l1_loss,
        "bias_cosine_loss": bias_cosine_loss,
    }


def proposals_from_predictions(
    coord: np.ndarray,
    logits: np.ndarray,
    bias_pred: np.ndarray,
    segment_ignore_index=(-1, 0, 1),
    cluster_thresh: float = 1.5,
    cluster_propose_points: int = 100,
    cluster_min_points: int = 50,
    voxel_size: float = 0.02,
):
    """Host-side proposal generation (reference eval branch, l.97-178).

    coord/logits/bias_pred are single-scene [N, ...] numpy arrays (valid
    points only). Returns dict(pred_masks [P, N] bool, pred_classes [P],
    pred_scores [P]).
    """
    from scenesplat_tpu import native

    prob = _softmax_np(logits)
    segment_pred = prob.argmax(-1)
    keep = ~np.isin(segment_pred, np.asarray(segment_ignore_index))
    n = coord.shape[0]
    if keep.sum() == 0:
        return dict(
            pred_masks=np.zeros((0, n), bool),
            pred_classes=np.zeros(0, np.int32),
            pred_scores=np.zeros(0, np.float32),
        )
    centers = (coord[keep] + bias_pred[keep]) / voxel_size
    cluster, num = native.pointgroup_cluster(
        centers.astype(np.float32), segment_pred[keep].astype(np.int32),
        radius=cluster_thresh, min_points=cluster_min_points,
    )
    masks, classes, scores = [], [], []
    keep_idx = np.where(keep)[0]
    for cid in range(num):
        members = keep_idx[cluster == cid]
        if members.size <= cluster_propose_points:
            continue
        m = np.zeros(n, bool)
        m[members] = True
        cls = segment_pred[members[0]]
        masks.append(m)
        classes.append(cls)
        scores.append(float(prob[members, cls].mean()))
    if not masks:
        return dict(
            pred_masks=np.zeros((0, n), bool),
            pred_classes=np.zeros(0, np.int32),
            pred_scores=np.zeros(0, np.float32),
        )
    return dict(
        pred_masks=np.stack(masks),
        pred_classes=np.asarray(classes, np.int32),
        pred_scores=np.asarray(scores, np.float32),
    )


def _softmax_np(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)
