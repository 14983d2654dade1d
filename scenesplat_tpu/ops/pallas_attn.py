"""Pallas TPU flash-window attention for serialized patches.

The hot kernel of PTv3: every block of every stage runs attention over
contiguous patches of the curve-sorted sequence (reference:
pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:172-222,
which calls flash_attn_varlen on GPU). Each program holds one window's
head-group in VMEM — no online softmax needed: load a [K, 3, Cg] qkv tile,
loop its heads with static lane slices, form each [K, K] score tile in VMEM,
softmax in fp32, contract with v, write [K, Cg] out. Scores never touch HBM.

Layout: qkv enters as a free reshape view [B, P, K, 3, C] of the [B, N, 3, C]
projection and the output [B, P, K, C] reshapes straight back to [B, N, C] —
no HBM-round-trip head transposes on either side. Mosaic requires the last
two block dims to be un-sliced, so heads cannot be a sliced trailing dim;
instead the channel axis is blocked in head-group tiles of
``Cg = lcm(head_dim, 128)`` lanes (a third grid axis) and the heads within a
group are split by static lane slices inside the kernel. Backward recomputes
the softmax in-kernel (flash-style rematerialization) instead of saving the
probability matrix, and writes dq/dk/dv as three separate outputs (storing
into the middle index of the qkv axis is an unsupported Mosaic shape cast).

MXU discipline: matmul operands stay in their storage dtype (bf16 on the hot
path) with fp32 accumulation via preferred_element_type — upcasting operands
to fp32 before the dot forces the slow multi-pass fp32 MXU path. For bf16
inputs the products are exact in fp32 either way, and the probability matrix
is cast to the storage dtype for the PV matmul exactly like the reference's
fp16 flash-attn does.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _group_channels(c: int, d: int) -> int:
    """Head-group tile width: lcm(d, 128) capped at the full C.

    Falls back to one full-C group when the lcm tile doesn't divide C
    (possible for head counts that aren't a multiple of 128/gcd(d,128)) —
    a partial trailing group would silently drop channels."""
    cg = min(c, math.lcm(d, 128))
    return cg if c % cg == 0 else c


def _head_softmax(q, k, valid_bias, scale):
    """[K, D] q,k -> fp32 probability tile [K, K] (masked, max-subtracted)."""
    s = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + valid_bias
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(qkv_ref, valid_ref, o_ref, *, scale, heads_per_group):
    valid = valid_ref[0, 0, 0, :]  # [K] int32

    @pl.when(valid[0] > 0)  # padding sorts last: window is live iff slot 0 is
    def _live():
        q = qkv_ref[0, 0, :, 0, :]  # [K, Cg]
        k = qkv_ref[0, 0, :, 1, :]
        v = qkv_ref[0, 0, :, 2, :]
        d = q.shape[-1] // heads_per_group
        bias = jnp.where(valid[None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)
        outs = []
        for h in range(heads_per_group):
            sl = slice(h * d, (h + 1) * d)
            p = _head_softmax(q[:, sl], k[:, sl], bias, scale)
            o = jax.lax.dot_general(
                p.astype(v.dtype),
                v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(o.astype(o_ref.dtype))  # bf16 accum: bounds VMEM
        o_ref[0, 0, :, :] = (
            outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        )

    @pl.when(valid[0] == 0)  # all-padding window: zero output, skip matmuls
    def _pad():
        o_ref[0, 0, :, :] = jnp.zeros_like(o_ref[0, 0, :, :])


def _bwd_kernel(qkv_ref, valid_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, heads_per_group, row_tile):
    valid = valid_ref[0, 0, 0, :]

    @pl.when(valid[0] == 0)
    def _pad():
        dq_ref[0, 0, :, :] = jnp.zeros_like(dq_ref[0, 0, :, :])
        dk_ref[0, 0, :, :] = jnp.zeros_like(dk_ref[0, 0, :, :])
        dv_ref[0, 0, :, :] = jnp.zeros_like(dv_ref[0, 0, :, :])

    @pl.when(valid[0] > 0)
    def _live():
        # Query-row tiling: at Cg=384/H=8 the untiled kernel's per-head fp32
        # [K, K] score temporaries co-live across the unrolled head loop and
        # blow the scoped-vmem budget (measured 108.9 MB vs the v5e 128 MB
        # VMEM). Recomputing the softmax per [row_tile, K] query stripe keeps
        # every temporary <= row_tile*K fp32; dk/dv accumulate across stripes
        # as fp32 loop carries, dq rows store directly per stripe.
        k_full = qkv_ref[0, 0, :, 1, :]
        v_full = qkv_ref[0, 0, :, 2, :]
        kk, cg = k_full.shape
        d = cg // heads_per_group
        bias = jnp.where(valid[None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)

        def cat(xs):
            return xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)

        def stripe(t, carry):
            dk_acc, dv_acc = carry  # [K, Cg] fp32
            q_t = qkv_ref[0, 0, pl.ds(t * row_tile, row_tile), 0, :]
            do_t = do_ref[0, 0, pl.ds(t * row_tile, row_tile), :]
            dqs, dks, dvs = [], [], []
            for h in range(heads_per_group):
                sl = slice(h * d, (h + 1) * d)
                qh, kh, vh, doh = q_t[:, sl], k_full[:, sl], v_full[:, sl], do_t[:, sl]
                pf = _head_softmax(qh, kh, bias, scale)  # [RT, K] fp32
                p = pf.astype(vh.dtype)
                dvs.append(
                    jax.lax.dot_general(
                        p, doh, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
                dp = jax.lax.dot_general(
                    doh, vh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(dp * pf, axis=-1, keepdims=True)
                ds = (pf * (dp - delta)).astype(vh.dtype)
                dqs.append(
                    (scale * jax.lax.dot_general(
                        ds, kh, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )).astype(dq_ref.dtype)
                )
                dks.append(
                    scale * jax.lax.dot_general(
                        ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            dq_ref[0, 0, pl.ds(t * row_tile, row_tile), :] = cat(dqs)
            return dk_acc + cat(dks), dv_acc + cat(dvs)

        dk_acc, dv_acc = jax.lax.fori_loop(
            0, kk // row_tile, stripe,
            (jnp.zeros((kk, cg), jnp.float32), jnp.zeros((kk, cg), jnp.float32)),
        )
        dk_ref[0, 0, :, :] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_acc.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_window_attention(qkv_sorted, valid_sorted, patch_size, num_heads, scale=None):
    """qkv_sorted: [B, N, 3, C]; valid_sorted: [B, N] bool -> [B, N, C]."""
    out, _ = _fwa_fwd(qkv_sorted, valid_sorted, patch_size, num_heads, scale)
    return out


def _views(qkv_sorted, valid_sorted, patch_size):
    b, n, three, c = qkv_sorted.shape
    p = n // patch_size
    qkv5 = qkv_sorted.reshape(b, p, patch_size, 3, c)
    # [B, P, 1, K]: the explicit unit dim keeps K out of the sliced block
    # positions (Mosaic wants the last two block dims un-sliced)
    valid_p = valid_sorted.astype(jnp.int32).reshape(b, p, 1, patch_size)
    return qkv5, valid_p, b, p, c


def _fwa_fwd(qkv_sorted, valid_sorted, patch_size, num_heads, scale):
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    qkv5, valid_p, b, p, c = _views(qkv_sorted, valid_sorted, patch_size)
    k = patch_size
    cg = _group_channels(c, d)
    groups = c // cg
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, heads_per_group=cg // d
        ),
        grid=(b, p, groups),
        in_specs=[
            pl.BlockSpec((1, 1, k, 3, cg), lambda i, j, g: (i, j, 0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, cg), lambda i, j, g: (i, j, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, k, c), qkv5.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * k * k * c,
            bytes_accessed=qkv5.size * qkv5.dtype.itemsize * 2,
            transcendentals=b * p * num_heads * k * k,
        ),
        # K=1024 score tiles (4 MB fp32 each) + double-buffered head-group
        # blocks exceed the 16 MB default scoped-vmem budget; v5e VMEM is
        # far larger
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(qkv5, valid_p)
    return out.reshape(b, n, c), (qkv_sorted, valid_sorted)


def _fwa_bwd(patch_size, num_heads, scale, residuals, g):
    qkv_sorted, valid_sorted = residuals
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    qkv5, valid_p, b, p, c = _views(qkv_sorted, valid_sorted, patch_size)
    k = patch_size
    cg = _group_channels(c, d)
    groups = c // cg
    do = g.reshape(b, p, k, c)
    row_tile = min(k, int(os.environ.get("SCENESPLAT_ATTN_BWD_TILE", "256")))
    if k % row_tile:  # non-power-of-two patch: one full-window stripe
        row_tile = k
    grad_spec = pl.BlockSpec((1, 1, k, cg), lambda i, j, gg: (i, j, 0, gg),
                             memory_space=pltpu.VMEM)
    grad_shape = jax.ShapeDtypeStruct((b, p, k, c), qkv5.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, heads_per_group=cg // d,
            row_tile=row_tile,
        ),
        grid=(b, p, groups),
        in_specs=[
            pl.BlockSpec((1, 1, k, 3, cg), lambda i, j, gg: (i, j, 0, 0, gg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k), lambda i, j, gg: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            grad_spec,
        ],
        out_specs=[grad_spec, grad_spec, grad_spec],
        out_shape=[grad_shape, grad_shape, grad_shape],
        # Measured demand at Cg=384/H=8/RT=256 is 74.4 MB (Mosaic does not
        # reuse temporaries across the unrolled head loop); v5e VMEM is
        # 128 MB/core, leave headroom for double-buffered blocks.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(qkv5, valid_p, do)
    # dq/dk/dv are [B, P, K, C]; qkv layout is [B, P, K, 3, C]
    dqkv = jnp.stack([dq, dk, dv], axis=3).reshape(b, n, 3, c)
    return dqkv, None


flash_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
