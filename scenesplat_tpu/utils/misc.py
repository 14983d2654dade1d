"""Metric and host-side helpers (reference: pointcept/utils/misc.py:17-298)."""

from __future__ import annotations

import os
from collections import abc
from typing import Optional

import numpy as np


class AverageMeter:
    """Tracks current value / running average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def intersection_and_union(
    output: np.ndarray,
    target: np.ndarray,
    num_classes: int,
    ignore_index: int = -1,
):
    """Per-class intersection / union / target counts.

    Mirrors reference pointcept/utils/misc.py:150-180 semantics: predictions at
    ignored targets are themselves set to ignore before the histogram.
    """
    output = output.reshape(-1).copy()
    target = target.reshape(-1)
    output[target == ignore_index] = ignore_index
    intersection = output[output == target]
    area_intersection, _ = np.histogram(
        intersection, bins=np.arange(num_classes + 1)
    )
    area_output, _ = np.histogram(output, bins=np.arange(num_classes + 1))
    area_target, _ = np.histogram(target, bins=np.arange(num_classes + 1))
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def make_dirs(path: str):
    os.makedirs(path, exist_ok=True)


def is_seq_of(seq, expected_type):
    if not isinstance(seq, abc.Sequence):
        return False
    return all(isinstance(item, expected_type) for item in seq)


def neighbor_voting(
    coord: np.ndarray,
    pred: np.ndarray,
    vote_k: int,
    valid_mask: np.ndarray,
    num_classes: int,
    query_coord: Optional[np.ndarray] = None,
    ignore_index: int = -1,
) -> np.ndarray:
    """Majority vote over the k nearest valid-prediction neighbors.

    Host-side kNN voting used at eval time (reference:
    pointcept/utils/misc.py:54-95, cKDTree + numba majority vote). Queries
    default to all points; only points with ``valid_mask`` contribute votes.
    """
    valid_coord = coord[valid_mask]
    valid_pred = pred[valid_mask]
    if valid_coord.shape[0] == 0:
        n = coord.shape[0] if query_coord is None else query_coord.shape[0]
        return np.full(n, ignore_index, dtype=pred.dtype)
    if query_coord is None:
        query_coord = coord
    k = min(vote_k, valid_coord.shape[0])

    from scenesplat_tpu import native

    if native.available():
        nn_idx = native.knn(valid_coord, query_coord, k)
        labels = valid_pred[nn_idx].astype(np.int32)
        return native.majority_vote(labels, num_classes, ignore_index).astype(
            pred.dtype
        )

    from scipy.spatial import cKDTree

    tree = cKDTree(valid_coord)
    _, nn_idx = tree.query(query_coord, k=k, workers=-1)
    nn_idx = np.atleast_2d(nn_idx)
    if nn_idx.ndim == 1:
        nn_idx = nn_idx[:, None]
    neighbor_labels = valid_pred[nn_idx]  # (M, k)
    return _majority_vote(neighbor_labels, num_classes, ignore_index)


def _majority_vote(
    neighbor_labels: np.ndarray, num_classes: int, ignore_index: int
) -> np.ndarray:
    """Vectorized per-row majority vote; ignore_index never wins unless all
    votes are ignored."""
    labels = neighbor_labels.astype(np.int64)
    valid = labels != ignore_index
    shifted = np.where(valid, labels, num_classes)  # bin ignore at the end
    counts = np.apply_along_axis(
        lambda row: np.bincount(row, minlength=num_classes + 1), 1, shifted
    )
    maj = counts[:, :num_classes].argmax(axis=1)
    no_valid = ~valid.any(axis=1)
    maj = maj.astype(neighbor_labels.dtype)
    maj[no_valid] = ignore_index
    return maj


def clustering_voting(
    pred: np.ndarray, instance: np.ndarray, ignore_index: int = -1
) -> np.ndarray:
    """Assign each instance the majority predicted class of its points
    (reference: pointcept/utils/misc.py:98-147)."""
    pred = pred.copy()
    for inst_id in np.unique(instance):
        if inst_id == ignore_index:
            continue
        mask = instance == inst_id
        # the ignore label votes like any other class (reference
        # misc.py:118-123): a mostly-low-confidence instance becomes
        # all-ignore rather than adopting a minority class
        values, counts = np.unique(pred[mask], return_counts=True)
        pred[mask] = values[counts.argmax()]
    return pred
