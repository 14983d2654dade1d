"""Pallas TPU flash-window attention for serialized patches.

The hot kernel of PTv3: every block of every stage runs attention over
contiguous patches of the curve-sorted sequence (reference:
pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:172-222,
which calls flash_attn_varlen on GPU). On TPU each (batch, patch, head)
program fits entirely in VMEM for patch sizes up to 1024, so no online
softmax is needed: load q/k/v tiles, form the [K, K] score tile in VMEM,
softmax in fp32, contract with v, and write [K, D] out — scores never touch
HBM.

Layout: the qkv tensor is only *reshaped* to [B, P, K, 3, H, D] (a free
view of the [B, N, 3, C] projection) and the per-head slicing happens in the
BlockSpec index map — no HBM-round-trip transposes on either side of the
kernel (the previous [B, H, P, K, 3, D] permute cost two full copies of the
activation per attention). Backward recomputes the softmax in-kernel
(flash-style rematerialization) instead of saving the probability matrix.

MXU discipline: matmul operands stay in their storage dtype (bf16 on the hot
path) with fp32 accumulation via preferred_element_type — upcasting operands
to fp32 before the dot forces the slow multi-pass fp32 MXU path. For bf16
inputs the products are exact in fp32 either way, and the probability matrix
is cast to the storage dtype for the PV matmul exactly like the reference's
fp16 flash-attn does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _fwd_kernel(qkv_ref, valid_ref, o_ref, *, scale):
    valid = valid_ref[0, 0, :]  # [K] int32

    @pl.when(valid[0] > 0)  # padding sorts last: window is live iff slot 0 is
    def _live():
        q = qkv_ref[0, 0, :, 0, 0, :]
        k = qkv_ref[0, 0, :, 1, 0, :]
        v = qkv_ref[0, 0, :, 2, 0, :]
        s = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype),
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, K] fp32
        bias = jnp.where(valid[None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)
        s = s + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, :, 0, :] = o.astype(o_ref.dtype)

    @pl.when(valid[0] == 0)  # all-padding window: zero output, skip matmuls
    def _pad():
        o_ref[0, 0, :, 0, :] = jnp.zeros_like(o_ref[0, 0, :, 0, :])


def _bwd_kernel(qkv_ref, valid_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    valid = valid_ref[0, 0, :]

    @pl.when(valid[0] == 0)
    def _pad():
        dq_ref[0, 0, :, 0, :] = jnp.zeros_like(dq_ref[0, 0, :, 0, :])
        dk_ref[0, 0, :, 0, :] = jnp.zeros_like(dk_ref[0, 0, :, 0, :])
        dv_ref[0, 0, :, 0, :] = jnp.zeros_like(dv_ref[0, 0, :, 0, :])

    @pl.when(valid[0] > 0)
    def _live():
        _bwd_live(qkv_ref, valid, do_ref, dq_ref, dk_ref, dv_ref, scale=scale)


def _bwd_live(qkv_ref, valid, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = qkv_ref[0, 0, :, 0, 0, :]
    k = qkv_ref[0, 0, :, 1, 0, :]
    v = qkv_ref[0, 0, :, 2, 0, :]
    do = do_ref[0, 0, :, 0, :]

    s = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bias = jnp.where(valid[None, :] > 0, 0.0, NEG_INF).astype(jnp.float32)
    s = s + bias
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)

    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, D]
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K, K] fp32
    pf = p.astype(jnp.float32)
    delta = jnp.sum(dp * pf, axis=-1, keepdims=True)
    ds = (pf * (dp - delta)).astype(v.dtype)
    dq = scale * jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # separate [K, D] outputs: storing into the middle index of a non-unit
    # dim is an unsupported Mosaic shape cast ("infer-vector-layout"), so
    # dq/dk/dv are distinct refs and the caller stacks them
    dq_ref[0, 0, :, 0, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, 0, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, 0, :] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_window_attention(qkv_sorted, valid_sorted, patch_size, num_heads, scale=None):
    """qkv_sorted: [B, N, 3, C]; valid_sorted: [B, N] bool -> [B, N, C]."""
    out, _ = _fwa_fwd(qkv_sorted, valid_sorted, patch_size, num_heads, scale)
    return out


def _views(qkv_sorted, valid_sorted, patch_size, num_heads):
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    p = n // patch_size
    qkv6 = qkv_sorted.reshape(b, p, patch_size, 3, num_heads, d)
    valid_p = valid_sorted.astype(jnp.int32).reshape(b, p, patch_size)
    return qkv6, valid_p, b, p, d


def _pallas_fwd(qkv6, valid_p, scale, num_heads):
    b, p, k, three, h, d = qkv6.shape
    grid = (b, p, h)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, k, 3, 1, d), lambda i, j, hh: (i, j, 0, 0, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i, j, hh: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, 1, d), lambda i, j, hh: (i, j, 0, hh, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, k, h, d), qkv6.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * h * k * k * d,
            bytes_accessed=qkv6.size * qkv6.dtype.itemsize * 2,
            transcendentals=b * p * h * k * k,
        ),
    )(qkv6, valid_p)
    return out  # [B, P, K, H, D]


def _fwa_fwd(qkv_sorted, valid_sorted, patch_size, num_heads, scale):
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    qkv6, valid_p, b, p, d = _views(qkv_sorted, valid_sorted, patch_size, num_heads)
    out = _pallas_fwd(qkv6, valid_p, scale, num_heads)
    return out.reshape(b, n, c), (qkv_sorted, valid_sorted)


def _fwa_bwd(patch_size, num_heads, scale, residuals, g):
    qkv_sorted, valid_sorted = residuals
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    qkv6, valid_p, b, p, d = _views(qkv_sorted, valid_sorted, patch_size, num_heads)
    do = g.reshape(b, p, patch_size, num_heads, d)

    grid = (b, p, num_heads)
    grad_spec = pl.BlockSpec(
        (1, 1, patch_size, 1, d), lambda i, j, hh: (i, j, 0, hh, 0),
        memory_space=pltpu.VMEM,
    )
    grad_shape = jax.ShapeDtypeStruct((b, p, patch_size, num_heads, d), qkv6.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, patch_size, 3, 1, d),
                         lambda i, j, hh: (i, j, 0, 0, hh, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, patch_size), lambda i, j, hh: (i, j, 0),
                         memory_space=pltpu.VMEM),
            grad_spec,
        ],
        out_specs=[grad_spec, grad_spec, grad_spec],
        out_shape=[grad_shape, grad_shape, grad_shape],
    )(qkv6, valid_p, do)

    dqkv = jnp.stack([dq, dk, dv], axis=3)  # [B, P, K, 3, H, D]
    return dqkv.reshape(b, n, 3, c), None


flash_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
