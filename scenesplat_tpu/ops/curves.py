"""Space-filling-curve encoders (Z-order and Hilbert) on uint32 pairs.

Semantics match the reference encoders bit-for-bit:
  - Z-order: bit i of x -> code bit 3i+2, y -> 3i+1, z -> 3i
    (reference: pointcept/models/utils/serialization/z_order.py:40-50).
  - Hilbert: Skilling's transform followed by MSB-first interleave and
    Gray-to-binary decode
    (reference: pointcept/models/utils/serialization/hilbert.py:91-198).
  - "-trans" variants swap the x and y axes before encoding
    (reference: pointcept/models/utils/serialization/default.py:12-18).

All encoders are pure jnp bit arithmetic on int32/uint32 lanes — no int64 —
returning 48-bit codes as (hi, lo) uint32 pairs (see ops.bitops). The Skilling
loop unrolls at trace time (depth*3 static iterations of cheap VPU ops), which
XLA fuses into a single elementwise kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .bitops import (
    deinterleave3_pair,
    interleave3_pair,
    pair_prefix_xor,
    pair_shift_right,
)

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def z_order_encode(grid_coord: jnp.ndarray, depth: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """grid_coord [..., 3] int32 -> (hi, lo) uint32 z-order codes."""
    x, y, z = grid_coord[..., 0], grid_coord[..., 1], grid_coord[..., 2]
    return interleave3_pair(x, y, z, depth)


def z_order_decode(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    x, y, z = deinterleave3_pair(hi, lo)
    return jnp.stack([x, y, z], axis=-1)


def hilbert_encode(
    grid_coord: jnp.ndarray, depth: int = 16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """grid_coord [..., 3] int32 -> (hi, lo) uint32 Hilbert codes.

    Vectorized Skilling transform: for each bit level from MSB to LSB and each
    dimension, conditionally invert / swap the lower bits of dimension 0 and
    the current dimension, then interleave and Gray-decode.
    """
    assert 0 < depth <= 16
    mask = jnp.uint32((1 << depth) - 1)
    x = [
        grid_coord[..., d].astype(jnp.uint32) & mask
        for d in range(3)
    ]

    for bit in range(depth - 1, -1, -1):  # p = bit position, MSB first
        low = jnp.uint32((1 << bit) - 1) if bit > 0 else None
        for dim in range(3):
            m = (x[dim] >> bit) & jnp.uint32(1)
            if low is None:
                continue  # no lower bits to transform at the last level
            # where bit set: invert lower bits of dim 0
            x[0] = x[0] ^ (m * low)
            # where bit clear: swap lower bits of dim 0 and dim
            to_flip = ((m ^ jnp.uint32(1)) * low) & (x[0] ^ x[dim])
            x[dim] = x[dim] ^ to_flip
            x[0] = x[0] ^ to_flip
    ghi, glo = interleave3_pair(x[0], x[1], x[2], depth)
    return pair_prefix_xor(ghi, glo, 3 * depth)


def hilbert_decode(hi: jnp.ndarray, lo: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """Inverse of :func:`hilbert_encode` (reference hilbert.py:201-303)."""
    assert 0 < depth <= 16
    # binary -> gray: g = b ^ (b >> 1)
    shi, slo = pair_shift_right(hi, lo, 1)
    ghi, glo = hi ^ shi, lo ^ slo
    x, y, z = deinterleave3_pair(ghi, glo)
    coords = [x.astype(jnp.uint32), y.astype(jnp.uint32), z.astype(jnp.uint32)]

    for bit in range(0, depth):  # LSB-level upward (reverse of encode)
        low = jnp.uint32((1 << bit) - 1) if bit > 0 else None
        for dim in range(2, -1, -1):
            m = (coords[dim] >> bit) & jnp.uint32(1)
            if low is None:
                continue
            # mirror of reference hilbert.py:267-287: invert, then swap
            coords[0] = coords[0] ^ (m * low)
            to_flip = ((m ^ jnp.uint32(1)) * low) & (coords[0] ^ coords[dim])
            coords[dim] = coords[dim] ^ to_flip
            coords[0] = coords[0] ^ to_flip
    return jnp.stack([c.astype(jnp.int32) for c in coords], axis=-1)


def encode(
    grid_coord: jnp.ndarray, order: str = "z", depth: int = 16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch like the reference serialization
    (pointcept/models/utils/serialization/default.py:8-24), minus the batch
    fold-in: batching is an explicit leading axis in this framework."""
    if order == "z":
        return z_order_encode(grid_coord, depth)
    if order == "z-trans":
        return z_order_encode(grid_coord[..., jnp.array([1, 0, 2])], depth)
    if order == "hilbert":
        return hilbert_encode(grid_coord, depth)
    if order == "hilbert-trans":
        return hilbert_encode(grid_coord[..., jnp.array([1, 0, 2])], depth)
    raise NotImplementedError(f"unknown order: {order}")
