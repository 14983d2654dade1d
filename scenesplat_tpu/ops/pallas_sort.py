"""Pallas TPU bitonic sort: fixed-compile-cost variadic sort for [B, N] rows.

Why: XLA's `lax.sort` on TPU lowers to an unrolled sorting network whose HLO
size grows ~log^2(N) x operands; at the row lengths the geometry program
needs (up to 2^20 for conv-plan merge-joins) those networks dominate compile
time/memory on the tunneled compile helper (CLAUDE.md round-1 notes: compiles
SIGKILL at N >= 64k). This kernel rolls the whole network into two nested
`fori_loop`s — compile cost is constant in N — and keeps every row resident
in VMEM.

Algorithm: classic bitonic sort over a power-of-two row padded with a
max-sentinel. The row lives as a [R, 128] tile; compare-exchange at distance
``d`` (always a power of two) is two circular rolls along one axis:

  - d < 128:   partner differs in a *column* bit -> roll axis 1 by +/-d
  - d >= 128:  partner differs in a *row* bit    -> roll axis 0 by +/-(d/128)

because for elements whose d-bit is 0 the partner (i + d) never wraps, and
for elements whose d-bit is 1 the partner (i - d) never wraps, the circular
roll is exact — no gathers, no scatters, pure VPU traffic.

Comparison is lexicographic over the first ``num_keys`` operands (uint32 /
int32); remaining operands ride along as payload, matching
``jax.lax.sort(operands, num_keys=k, is_stable=False)`` semantics (ties may
be reordered; every sort site in this codebase is tie-indifferent).

Used by ops.bitops / ops.serialization when rows exceed the XLA-friendly
size; reference equivalents are the argsorts in
pointcept/models/utils/structure.py:81-102 (serialization) and spconv's
hash-table builds (replaced here by sort-based merge-joins).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# VMEM budget for one row's operands. Measured peak ~5.7x operand data
# (aliased in/out buffers + loop-carried values + roll temps + index iotas):
# 3 MB of data hit the 16 MB scoped-VMEM limit. The policy below only routes
# rows <= 2^16 to the kernel anyway (Mosaic compile jumps 3.5 s -> ~195 s
# between 512 and 1024 sublane rows), so 2 MB is ample headroom.
_MAX_ROW_BYTES = 2 * 2**20
_PALLAS_MIN = 1 << 15  # <= 32768: XLA compiles fast, keep it
_PALLAS_MAX = 1 << 16  # > 65536 padded rows: Mosaic compile cliff
_XLA_SAFE = 1 << 17  # measured-fast XLA sort sizes are 2^17, 2^18, 2^19, 2^20


def use_pallas_sort(num_ops: int, n: int) -> bool:
    """Policy: route a [B, n] sort through the Pallas kernel?

    OFF by default. Measured fresh-compile times pinned the toolchain's
    pathological lax.sort lowering to the *1-key + >= 2 payloads* variant
    (4 s @ 32k, 47 s @ 48k, 310 s @ 64k, 365 s @ 96k for 1-key 3-operand),
    while the same sizes with num_keys >= 2 compile in 4-8 s and even
    3-key 5-operand rows at 2^20 take 17 s. :func:`sort_rows` therefore
    promotes a payload to a tie-breaking second key — every sort site here is
    tie-indifferent — and stays on XLA, which the tunnel persist-caches
    (Pallas custom calls are NOT cached and cost a fresh ~3.5 s Mosaic
    compile per instance per program, jumping to ~195 s at 2^17 rows).
    The kernel remains available via SCENESPLAT_PALLAS_SORT=1 (tests force it
    on CPU in interpret mode; also the escape hatch if a future toolchain
    regresses the 2-key lowering too).
    """
    env = os.environ.get("SCENESPLAT_PALLAS_SORT")
    fits = num_ops * _next_pow2(n) * 4 <= _MAX_ROW_BYTES
    if env == "1":
        return fits
    return False


def sort_rows(operands, num_keys: int = 1):
    """lax.sort(dimension=-1, is_stable=False) drop-in that routes around the
    toolchain's pathological compile variants (see :func:`use_pallas_sort`).

    When a 1-key sort carries two or more payloads, the first payload is
    promoted to a tie-breaking second key: the lowering XLA picks for 1-key
    multi-payload sorts compiles catastrophically slowly at mid row lengths
    (~5 min at 64k), while the multi-key comparator is uniformly fast. All
    call sites are tie-indifferent (codes tie only within a voxel), and the
    promotion makes tie order deterministic as a bonus.
    """
    operands = tuple(operands)
    n = operands[0].shape[-1]
    if os.environ.get("SCENESPLAT_RADIX_SORT") == "1":
        # pure-XLA LSD radix: flat compile cost, stable (no tie-break
        # promotion needed); runtime vs the sort networks is a hardware
        # question — probe_radix_tpu.py before defaulting (TPU_TODO.md)
        from .radix_sort import radix_sort_rows

        return radix_sort_rows(operands, num_keys=num_keys)
    if use_pallas_sort(len(operands), n):
        interpret = jax.default_backend() == "cpu"
        return bitonic_sort(operands, num_keys=num_keys, interpret=interpret)
    if num_keys == 1 and len(operands) >= 2:
        num_keys = 2
    return jax.lax.sort(
        operands, dimension=-1, num_keys=num_keys, is_stable=False
    )


def _partner(vals, shift, axis, bit_is_zero):
    """Value of each element's compare-exchange partner.

    vals: tuple of [R, 128] arrays. ``bit_is_zero``: [R, 128] bool, True where
    the element's exchange-bit is 0 (partner is at +shift along ``axis``).
    Rolls are circular but never actually wrap (see module docstring).
    """

    size = vals[0].shape[axis]

    def roll_one(v):
        # roll by -shift == roll by size - shift (pltpu.roll wants shift >= 0)
        plus = pltpu.roll(v, shift=size - shift, axis=axis)
        minus = pltpu.roll(v, shift=shift, axis=axis)
        return jnp.where(bit_is_zero, plus, minus)

    return tuple(roll_one(v) for v in vals)


def _lex_less(a_keys, b_keys):
    """a < b lexicographic over key tuples (uint32 compare)."""
    less = None
    eq = None
    for ak, bk in zip(a_keys, b_keys):
        ak = ak.astype(jnp.uint32)
        bk = bk.astype(jnp.uint32)
        lt = ak < bk
        if less is None:
            less, eq = lt, ak == bk
        else:
            less = less | (eq & lt)
            eq = eq & (ak == bk)
    return less


def _sort_kernel(*refs, num_ops: int, num_keys: int, n: int, log2n: int):
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    rows = n // LANES

    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    def flat_bit(d):
        """(i & d) == 0 for flat index i = row*128 + col, d a power of two.

        Selects on i32 vectors, then compares — Mosaic cannot legalize
        selects between i1 vectors. ``d`` may be traced."""
        d_rows = d // LANES
        bit = jnp.where(d < LANES, col_id & d, row_id & d_rows)
        return bit == 0

    vals = tuple(r[0] for r in in_refs)

    def stage(vals, up, d, shift, axis, active=None):
        """One compare-exchange stage; ``up``: [R, 128] ascending-block mask
        (from the phase's m-bit); partner = index ^ d along ``axis``.

        VMEM discipline: compute the swap predicate from the key operands
        first, then roll + select each operand one at a time — peak live set
        is vals + one partner + masks, not 2x vals + partner tuple."""
        bit0 = flat_bit(d)
        key_partner = _partner(vals[:num_keys], shift, axis, bit0)
        want_self_smaller = up == bit0
        p_less = _lex_less(key_partner, vals[:num_keys])
        s_less = _lex_less(vals[:num_keys], key_partner)
        # bitwise, not where(): Mosaic can't select between i1 vectors
        take = (want_self_smaller & p_less) | (~want_self_smaller & s_less)
        if active is not None:
            take = take & active
        out = []
        for i, v in enumerate(vals):
            p = (
                key_partner[i]
                if i < num_keys
                else _partner((v,), shift, axis, bit0)[0]
            )
            out.append(jnp.where(take, p, v))
        return tuple(out)

    def col_tail(vals, up, first_d):
        """Statically-unrolled d = 64, 32, ..., 1 stages (axis-1 rolls with
        static shifts compile leaner in Mosaic than a dynamic-shift loop).
        Early phases start below 64: stages above ``first_d`` fold to
        identity via the ``active`` mask (cheaper than branching)."""
        for sd in (64, 32, 16, 8, 4, 2, 1):
            vals = stage(vals, up, jnp.int32(sd), sd, 1,
                         active=first_d >= sd)
        return vals

    def phase_body(p, vals):
        # phase p: m = 2 << p, d = 2^p, 2^(p-1), ..., 1
        m = jnp.int32(2) << p
        up = flat_bit(m)

        def row_stage_body(q, vals):
            d = (jnp.int32(1) << p) >> q
            return stage(vals, up, d, d // LANES, 0)

        # d >= 128: dynamic-shift axis-0 rolls, trip count max(p - 6, 0)
        vals = jax.lax.fori_loop(
            0, jnp.maximum(p - 6, 0), row_stage_body, vals
        )
        # d <= 64 (or the whole phase if p < 7): static unrolled column tail
        first_d = jnp.minimum(jnp.int32(1) << p, 64)
        return col_tail(vals, up, first_d)

    vals = jax.lax.fori_loop(0, log2n, phase_body, vals)
    for o, v in zip(out_refs, vals):
        o[0] = v


def _next_pow2(n: int) -> int:
    return 1 << max(10, int(np.ceil(np.log2(max(n, 2)))))


@functools.partial(jax.jit, static_argnames=("num_keys", "interpret"))
def _sort_rows(operands, num_keys: int, interpret: bool = False):
    b, n = operands[0].shape
    rows = n // LANES
    num_ops = len(operands)
    ops3d = [op.reshape(b, rows, LANES) for op in operands]
    kernel = functools.partial(
        _sort_kernel,
        num_ops=num_ops,
        num_keys=num_keys,
        n=n,
        log2n=int(np.log2(n)),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(num_ops)
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(num_ops)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), op.dtype) for op in ops3d
        ],
        input_output_aliases={i: i for i in range(num_ops)},
        interpret=interpret,
    )(*ops3d)
    return tuple(o.reshape(b, n) for o in outs)


def bitonic_sort(
    operands: Sequence[jnp.ndarray],
    num_keys: int = 1,
    interpret: bool = False,
):
    """Drop-in for ``jax.lax.sort(operands, dimension=-1, num_keys=...,
    is_stable=False)`` over [B, N] (or [N]) int32/uint32 arrays.

    Rows are padded to a power of two (>= 1024) with a per-key max sentinel
    (0xFFFFFFFF); pad slots sort last and are sliced off. 32-bit operand
    dtypes only.

    CONTRACT when n is not a power of two: every *real* element's key tuple
    must compare strictly below (0xFFFFFFFF, ...) — otherwise pad slots (whose
    payloads are zeros) can displace real max-key elements in the kept prefix.
    Callers fold mask sentinels to 0xFFFFFFFE (bitops.SENTINEL_PACKED) for
    this reason.
    """
    operands = [jnp.asarray(op) for op in operands]
    shape = operands[0].shape
    n = shape[-1]
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    operands = [op.reshape(b, n) for op in operands]
    for op in operands:
        assert op.shape == (b, n), "all operands must share a shape"
        assert op.dtype.itemsize == 4 and jnp.issubdtype(
            op.dtype, jnp.integer
        ), f"32-bit integer operands only, got {op.dtype}"
    np2 = _next_pow2(n)
    if np2 != n:
        pad = np2 - n

        def pad_op(op, is_key):
            fill = (
                jnp.asarray(0xFFFFFFFF, jnp.uint32).astype(op.dtype)
                if is_key
                else jnp.zeros((), op.dtype)
            )
            return jnp.concatenate(
                [op, jnp.full((b, pad), fill, op.dtype)], axis=-1
            )

        operands = [
            pad_op(op, i < num_keys) for i, op in enumerate(operands)
        ]
    outs = _sort_rows(tuple(operands), num_keys, interpret=interpret)
    return tuple(o[:, :n].reshape(shape) for o in outs)
