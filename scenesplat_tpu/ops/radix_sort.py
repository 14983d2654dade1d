"""Pure-XLA LSD radix sort for [B, N] uint32 rows.

Candidate replacement for the XLA comparison-sort networks in the geometry
path (VERDICT round-1 item 4): `lax.sort` lowers to an unrolled sorting
network whose HLO grows ~log^2(N) x operands (fresh compiles 4-18 s at the
geometry row lengths, pathological variants far worse — see
ops/pallas_sort.py), while this radix sort's graph is a fixed number of
identical passes — compile cost flat in N, and STABLE, so the 2-key
tie-break promotion workaround becomes unnecessary.

Per pass (``bits`` wide digits, LSD over lo then hi key words):

  digit   = (key >> shift) & mask                    # [B, N]
  onehot  = one_hot(digit, D)                        # [B, N, D] int32
  within  = cumsum(onehot, N-axis) - onehot          # earlier equal digits
  offsets = exclusive-cumsum of per-digit counts     # [B, D]
  rank    = within[digit] + offsets[digit]           # [B, N] permutation
  inverse = scatter(iota at rank)                    # one [B, N] scatter
  ops     = take_along_axis(op, inverse)             # K gathers

Everything is dense elementwise/cumsum work the TPU compiles trivially; the
data movement is one permutation scatter + K element gathers per pass.
Whether that beats the sort networks at runtime is a hardware question —
probe on the tunnel (TPU_TODO.md item 9) before making it the default.
``SCENESPLAT_RADIX_SORT=1`` routes ops/pallas_sort.py:sort_rows through it.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def _one_pass(keys, payloads, shift, bits):
    """One stable counting-sort pass on digit (key >> shift) & (2^bits - 1).

    keys: tuple of [B, N] uint32 words, most significant FIRST; the digit
    comes from the last word (callers iterate shifts LSD-first across
    words). payloads: remaining [B, N] operands.
    """
    b, n = keys[0].shape
    d = 1 << bits
    digit = ((keys[-1] >> shift) & (d - 1)).astype(jnp.int32)  # [B, N]
    onehot = jax.nn.one_hot(digit, d, dtype=jnp.int32)  # [B, N, D]
    within = jnp.cumsum(onehot, axis=1) - onehot
    counts = onehot.sum(axis=1)  # [B, D]
    offsets = jnp.cumsum(counts, axis=1) - counts  # exclusive
    rank = (
        jnp.take_along_axis(within, digit[..., None], axis=2)[..., 0]
        + jnp.take_along_axis(offsets, digit, axis=1)
    )
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    inverse = jnp.zeros((b, n), jnp.int32).at[
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 0), rank
    ].set(iota, mode="promise_in_bounds", unique_indices=True)
    gather = lambda x: jnp.take_along_axis(x, inverse, axis=1)  # noqa: E731
    return tuple(gather(k) for k in keys), tuple(
        gather(p) for p in payloads
    )


@partial(jax.jit, static_argnames=("num_keys", "bits", "key_bits"))
def radix_sort_rows(
    operands: Sequence[jnp.ndarray],
    num_keys: int = 1,
    bits: int = 8,
    key_bits: int = 32,
):
    """STABLE ascending sort of [B, N] rows by the first ``num_keys``
    uint32 operands (lexicographic, operand 0 most significant); remaining
    operands ride as payload. Drop-in for
    ``lax.sort(operands, dimension=-1, num_keys=k, is_stable=True)`` on
    32-bit integer data.

    ``key_bits`` bounds the used bits per key word (e.g. 30 for packed
    serialization codes) — fewer passes for narrower keys.
    """
    operands = [jnp.asarray(op) for op in operands]
    shape = operands[0].shape
    n = shape[-1]
    # flatten all leading dims into one batch axis (lax.sort semantics:
    # sort along the last dimension of arbitrarily-shaped operands)
    operands = [op.reshape(-1, n) for op in operands]
    keys = [op.astype(jnp.uint32) for op in operands[:num_keys]]
    payloads = list(operands[num_keys:])
    n_passes = -(-key_bits // bits)
    # LSD: least-significant key word first, low digits first
    for ki in range(num_keys - 1, -1, -1):
        # rotate so the active key word sits last (digit source)
        active = keys[ki]
        rest_keys = keys[:ki] + keys[ki + 1:]
        for p in range(n_passes):
            (new_rest_and_active), (new_payloads) = _one_pass(
                tuple(rest_keys) + (active,), tuple(payloads),
                p * bits, bits,
            )
            rest_keys = list(new_rest_and_active[:-1])
            active = new_rest_and_active[-1]
            payloads = list(new_payloads)
        keys = rest_keys[:ki] + [active] + rest_keys[ki:]
    outs = [k.astype(op.dtype) for k, op in zip(keys, operands)] + payloads
    return tuple(o.reshape(shape) for o in outs)
