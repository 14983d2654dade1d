"""Masked segment reductions and serialized pooling primitives.

TPU-native replacement for torch_scatter.segment_csr + torch.unique cluster
construction used by the reference's SerializedPooling
(pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:341-444).

Clusters are derived from sorted curve codes: points sharing the parent voxel
(code >> 3*pooling_depth) are consecutive along the first curve order, so
cluster ids are a cumulative sum over "code changed" flags — no dynamic-shape
``unique`` needed. Outputs live in fixed-capacity buffers: each pooling stage
has a static output capacity; overflow clusters are routed to a discard bin
(capacity is a config knob, overflow is counted for debugging).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .bitops import SENTINEL_HI, pair_shift_right
from .serialization import Serialization, sort_codes, take_along_points


def segment_sum(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Batched segment sum: values [B, N, C], seg_ids [B, N] -> [B, S, C]."""
    b = values.shape[0]
    flat_ids = seg_ids + (
        jnp.arange(b, dtype=seg_ids.dtype)[:, None] * num_segments
    )
    out = jax.ops.segment_sum(
        values.reshape((-1,) + values.shape[2:]),
        flat_ids.reshape(-1),
        num_segments=b * num_segments,
    )
    return out.reshape((b, num_segments) + values.shape[2:])


def segment_max(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    b = values.shape[0]
    flat_ids = seg_ids + (
        jnp.arange(b, dtype=seg_ids.dtype)[:, None] * num_segments
    )
    out = jax.ops.segment_max(
        values.reshape((-1,) + values.shape[2:]),
        flat_ids.reshape(-1),
        num_segments=b * num_segments,
    )
    return out.reshape((b, num_segments) + values.shape[2:])


def segment_min(values: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    b = values.shape[0]
    flat_ids = seg_ids + (
        jnp.arange(b, dtype=seg_ids.dtype)[:, None] * num_segments
    )
    out = jax.ops.segment_min(
        values.reshape((-1,) + values.shape[2:]),
        flat_ids.reshape(-1),
        num_segments=b * num_segments,
    )
    return out.reshape((b, num_segments) + values.shape[2:])


def segment_reduce(
    values: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    counts: jnp.ndarray,
    reduce: str = "mean",
) -> jnp.ndarray:
    """Reduce with semantics matching torch_scatter.segment_csr; ``counts``
    is [B, S] (number of members per segment, 0 for empty)."""
    if reduce == "sum":
        return segment_sum(values, seg_ids, num_segments)
    if reduce == "mean":
        s = segment_sum(values, seg_ids, num_segments)
        return s / jnp.maximum(counts, 1)[..., None].astype(s.dtype)
    if reduce == "max":
        m = segment_max(values, seg_ids, num_segments)
        return jnp.where(counts[..., None] > 0, m, 0.0).astype(values.dtype)
    if reduce == "min":
        m = segment_min(values, seg_ids, num_segments)
        return jnp.where(counts[..., None] > 0, m, 0.0).astype(values.dtype)
    raise ValueError(f"unknown reduce: {reduce}")


class PoolingPlan(NamedTuple):
    """Static-shape description of one serialized pooling step.

    B = batch, N = input capacity, M = output (cluster) capacity.
    ``seg_sorted`` assigns each *sorted* input slot a cluster id in [0, M]
    (M = discard bin for overflow/padding). ``order0`` is the curve-0 sort
    permutation used to bring per-point values into sorted order.
    ``cluster_of_point`` maps each input point (original layout) to its
    cluster id (for unpooling); ``head_index`` maps each cluster to the
    original index of its first member. ``counts`` is members per cluster.
    """

    order0: jnp.ndarray  # [B, N] int32
    seg_sorted: jnp.ndarray  # [B, N] int32 in [0, M]
    cluster_of_point: jnp.ndarray  # [B, N] int32 in [0, M-1] (clamped)
    head_index: jnp.ndarray  # [B, M] int32 (into original layout)
    counts: jnp.ndarray  # [B, M] int32
    out_mask: jnp.ndarray  # [B, M] bool
    n_clusters: jnp.ndarray  # [B] int32 (before capacity clamp)
    n_overflow: jnp.ndarray  # [B] int32 (clusters lost to capacity)


def build_pooling_plan(
    ser: Serialization,
    mask: jnp.ndarray,
    out_capacity: int,
    pooling_depth: int = 1,
) -> PoolingPlan:
    """Derive cluster structure by right-shifting curve-0 codes.

    Mirrors reference SerializedPooling.forward:371-444 — cluster = unique of
    (code >> 3*pooling_depth) over the first curve — in fixed shapes.
    """
    n = mask.shape[-1]
    m = out_capacity
    order0 = ser.order[0]
    inverse0 = ser.inverse[0]

    hi_sorted = take_along_points(ser.code_hi[0], order0)
    lo_sorted = take_along_points(ser.code_lo[0], order0)
    ph, pl = pair_shift_right(hi_sorted, lo_sorted, 3 * pooling_depth)
    mask_sorted = take_along_points(mask.astype(jnp.int32), order0).astype(bool)

    changed = jnp.concatenate(
        [
            jnp.ones(ph.shape[:-1] + (1,), bool),
            (ph[..., 1:] != ph[..., :-1]) | (pl[..., 1:] != pl[..., :-1]),
        ],
        axis=-1,
    )
    new_cluster = changed & mask_sorted
    cluster_sorted = jnp.cumsum(new_cluster.astype(jnp.int32), axis=-1) - 1
    n_clusters = jnp.sum(new_cluster, axis=-1).astype(jnp.int32)
    n_overflow = jnp.maximum(n_clusters - m, 0)

    in_cap = cluster_sorted < m
    seg_sorted = jnp.where(mask_sorted & in_cap, cluster_sorted, m).astype(jnp.int32)

    # first sorted position of each cluster
    pos = jax.lax.broadcasted_iota(jnp.int32, seg_sorted.shape, seg_sorted.ndim - 1)
    head_pos = segment_min(pos[..., None], seg_sorted, m + 1)[..., 0]
    head_pos = jnp.clip(head_pos[..., :m], 0, n - 1)
    head_index = take_along_points(order0, head_pos)

    counts = segment_sum(
        mask_sorted.astype(jnp.int32)[..., None], seg_sorted, m + 1
    )[..., :m, 0]
    out_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (mask.shape[0], m), 1)
        < jnp.minimum(n_clusters, m)[:, None]
    )

    cluster_of_point = take_along_points(
        jnp.minimum(cluster_sorted, m - 1), inverse0
    ).astype(jnp.int32)

    return PoolingPlan(
        order0=order0,
        seg_sorted=seg_sorted,
        cluster_of_point=cluster_of_point,
        head_index=head_index,
        counts=counts,
        out_mask=out_mask,
        n_clusters=n_clusters,
        n_overflow=n_overflow,
    )


def pool_values(
    plan: PoolingPlan, values: jnp.ndarray, reduce: str = "mean"
) -> jnp.ndarray:
    """Reduce per-point values [B, N, C] into cluster buffers [B, M, C]."""
    m = plan.head_index.shape[-1]
    sorted_vals = take_along_points(values, plan.order0)
    pad = jnp.zeros(plan.counts.shape[:-1] + (1,), plan.counts.dtype)
    counts = jnp.concatenate([plan.counts, pad], axis=-1)
    out = segment_reduce(sorted_vals, plan.seg_sorted, m + 1, counts, reduce)
    return out[:, :m]


def pool_serialization(
    plan: PoolingPlan,
    ser: Serialization,
    pooling_depth: int = 1,
    packed: bool = False,
) -> Serialization:
    """Per-curve codes/orders for the pooled points: shift head codes and
    re-sort (reference point_transformer_v3m1_base.py:398-407)."""
    s = ser.code_hi.shape[0]
    head = plan.head_index[None].repeat(s, axis=0)  # [S, B, M]
    hi = jnp.take_along_axis(ser.code_hi, head, axis=-1)
    lo = jnp.take_along_axis(ser.code_lo, head, axis=-1)
    hi, lo = pair_shift_right(hi, lo, 3 * pooling_depth)
    hi = jnp.where(plan.out_mask[None], hi, SENTINEL_HI)
    # curve 0 (physically always "z", see Serialization.perm) needs no sort:
    # clusters are numbered along the sorted curve-0 codes, right-shift is
    # order-preserving, distinct clusters have distinct parent codes, and
    # invalid slots (SENTINEL_HI) are a trailing suffix — so the pooled
    # curve-0 codes are already ascending and order = inverse = iota.
    iota = jax.lax.broadcasted_iota(jnp.int32, hi.shape[1:], 1)[None]
    if s > 1:
        order_rest, inverse_rest = sort_codes(hi[1:], lo[1:], packed=packed)
        order = jnp.concatenate([iota, order_rest], axis=0)
        inverse = jnp.concatenate([iota, inverse_rest], axis=0)
    else:
        order = inverse = iota
    return Serialization(
        code_hi=hi, code_lo=lo, order=order, inverse=inverse, perm=ser.perm
    )


def unpool_values(values_pooled: jnp.ndarray, cluster_of_point: jnp.ndarray) -> jnp.ndarray:
    """Broadcast cluster values [B, M, C] back to points [B, N, C]."""
    return take_along_points(values_pooled, cluster_of_point)


def masked_mean_pool(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Global mean over valid points: [B, N, C] -> [B, C] (reference
    segment_csr global pooling, models/default.py:262)."""
    w = mask[..., None].astype(values.dtype)
    return (values * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
