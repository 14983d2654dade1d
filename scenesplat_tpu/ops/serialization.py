"""Batched point-cloud serialization.

Replaces the reference's ``Point.serialization``
(pointcept/models/utils/structure.py:47-102) with a fixed-shape, jit-friendly
formulation. The reference packs scenes into one ragged buffer and folds the
batch index into the code's high bits; here the batch is an explicit leading
axis of dense padded tensors, padding slots carry a sentinel code that sorts
last, and sorting uses a 2-key lexicographic ``lax.sort`` over (hi, lo) uint32
lanes (see ops.bitops).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .bitops import SENTINEL_HI, invert_order, lexsort_pair
from .curves import encode


class Serialization(NamedTuple):
    """Per-curve serialization state for a padded batch of point clouds.

    Shapes use S = number of curve orders, B = batch, N = padded points.
    ``order[s, b, j]`` is the source index of the j-th point along curve s;
    ``inverse`` is the inverse permutation. Padding points sort last in every
    curve. ``code_hi/lo`` are the (unsorted, per-point) 48-bit code lanes.

    ``perm`` [S] implements order shuffling (reference structure.py:94-98) as
    an index indirection: consumers look up curve ``perm[i]`` instead of
    physically permuting the [S, B, N] arrays. This keeps curve 0 stably "z"
    so the submanifold-conv neighbor plan can reuse the z-sort for free.
    """

    code_hi: jnp.ndarray  # [S, B, N] uint32
    code_lo: jnp.ndarray  # [S, B, N] uint32
    order: jnp.ndarray  # [S, B, N] int32
    inverse: jnp.ndarray  # [S, B, N] int32
    perm: jnp.ndarray  # [S] int32

    def curve_order(self, index: int) -> jnp.ndarray:
        """order of logical curve ``index`` (respects shuffling): [B, N]."""
        return jnp.take(self.order, self.perm[index], axis=0)

    def curve_inverse(self, index: int) -> jnp.ndarray:
        return jnp.take(self.inverse, self.perm[index], axis=0)


def compute_codes(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    orders: Sequence[str],
    depth: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode per-curve codes with padding sentinels.

    grid_coord: [B, N, 3] int32 (non-negative), mask: [B, N] bool.
    Returns (code_hi, code_lo): [S, B, N] uint32.
    """
    his, los = [], []
    for order_name in orders:
        hi, lo = encode(grid_coord, order=order_name, depth=depth)
        hi = jnp.where(mask, hi, SENTINEL_HI)
        his.append(hi)
        los.append(lo)
    return jnp.stack(his), jnp.stack(los)


def sort_codes(
    code_hi: jnp.ndarray, code_lo: jnp.ndarray, packed: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (order, inverse) permutations along the last axis."""
    _, _, order = lexsort_pair(code_hi, code_lo, axis=-1, packed=packed)
    inverse = invert_order(order, axis=-1)
    return order, inverse


def serialize(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    orders: Sequence[str] = ("z",),
    depth: int = 16,
) -> Serialization:
    code_hi, code_lo = compute_codes(grid_coord, mask, orders, depth)
    order, inverse = sort_codes(code_hi, code_lo, packed=depth <= 10)
    return Serialization(
        code_hi=code_hi,
        code_lo=code_lo,
        order=order,
        inverse=inverse,
        perm=jnp.arange(len(orders), dtype=jnp.int32),
    )


def shuffle_orders(ser: Serialization, rng: jax.Array) -> Serialization:
    """Randomly permute the logical curve order (reference structure.py:94-98)
    via the ``perm`` indirection — no data movement."""
    s = ser.order.shape[0]
    perm = jax.random.permutation(rng, s).astype(jnp.int32)
    return ser._replace(perm=jnp.take(ser.perm, perm, axis=0))


def take_along_points(values: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point values [B, N, ...] by per-batch indices [B, M].

    Implemented as a flat gather with the batch folded into the index — the
    batched take_along_axis lowers to a slower gather on TPU.
    """
    b, n = values.shape[:2]
    rest = values.shape[2:]
    flat = values.reshape((b * n,) + rest)
    base = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) * n
    idx = indices.astype(jnp.int32) + base
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape((b, indices.shape[1]) + rest)


def grid_coord_from_coord(
    coord: jnp.ndarray, grid_size: float, mask: jnp.ndarray
) -> jnp.ndarray:
    """Quantize raw coords to non-negative grid coords per scene
    (reference structure.py:54-62: trunc((coord - min) / grid_size))."""
    big = jnp.asarray(jnp.finfo(coord.dtype).max, coord.dtype)
    masked = jnp.where(mask[..., None], coord, big)
    cmin = jnp.min(masked, axis=1, keepdims=True)
    gc = jnp.floor((coord - cmin) / grid_size).astype(jnp.int32)
    return jnp.where(mask[..., None], jnp.maximum(gc, 0), 0)
