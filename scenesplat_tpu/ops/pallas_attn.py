"""Pallas TPU flash-window attention for serialized patches.

The hot kernel of PTv3: every block of every stage runs attention over
contiguous patches of the curve-sorted sequence (reference:
pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:172-222,
which calls flash_attn_varlen on GPU). On TPU each (batch, patch, head)
program fits entirely in VMEM for patch sizes up to 1024, so no online
softmax is needed: load q/k/v tiles, form the [K, K] score tile in VMEM,
softmax in fp32, contract with v, and write [K, D] out — scores never touch
HBM. Backward recomputes the softmax in-kernel (flash-style rematerialization)
instead of saving the probability matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _fwd_kernel(qkv_ref, valid_ref, o_ref, *, scale):
    q = qkv_ref[0, 0, :, 0, :]
    k = qkv_ref[0, 0, :, 1, :]
    v = qkv_ref[0, 0, :, 2, :]
    valid = valid_ref[0, 0, 0, :]  # [K] int32

    # inputs stay in their storage dtype (bf16 on the hot path): the MXU's
    # fast path is low-precision operands with fp32 accumulation — upcasting
    # operands to fp32 before the dot forces multi-pass fp32 matmuls. For
    # bf16 inputs the products are exact in fp32 either way, so this changes
    # nothing numerically vs the reference's upcast_softmax semantics.
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
        p.astype(v.dtype),  # probabilities in storage dtype for the MXU
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, valid_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    # operands stay in storage dtype for every dot (MXU fast path, see
    # _fwd_kernel); softmax and the ds combination run in fp32
    q = qkv_ref[0, 0, :, 0, :]
    k = qkv_ref[0, 0, :, 1, :]
    v = qkv_ref[0, 0, :, 2, :]
    valid = valid_ref[0, 0, 0, :]
    do = do_ref[0, 0, :, :]

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
    # three [K, D] outputs: storing into the middle index of a (1,1,K,3,D)
    # block needs a vector<KxD> -> vector<1x1xKx1xD> shape cast that Mosaic's
    # layout inference rejects ("infer-vector-layout: unsupported shape
    # cast"); separate 2-D tiles store cleanly
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _reshape_heads(qkv_sorted, patch_size, num_heads):
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    p = n // patch_size
    # [B, N, 3, H, D] -> [B, H, P, K, 3, D] -> flatten BH
    x = qkv_sorted.reshape(b, p, patch_size, three, num_heads, d)
    x = x.transpose(0, 4, 1, 2, 3, 5)
    return x.reshape(b * num_heads, p, patch_size, three, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_window_attention(qkv_sorted, valid_sorted, patch_size, num_heads, scale=None):
    """qkv_sorted: [B, N, 3, C]; valid_sorted: [B, N] bool -> [B, N, C]."""
    out, _ = _fwa_fwd(qkv_sorted, valid_sorted, patch_size, num_heads, scale)
    return out


def _pallas_fwd(qkv_bh, valid_bh, scale):
    bh, p, k, three, d = qkv_bh.shape
    grid = (bh, p)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, k, 3, d), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, p, k, d), qkv_bh.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * p * k * k * d,
            bytes_accessed=qkv_bh.size * qkv_bh.dtype.itemsize * 2,
            transcendentals=bh * p * k * k,
        ),
    )(qkv_bh, valid_bh[:, :, None, :])


def _fwa_fwd(qkv_sorted, valid_sorted, patch_size, num_heads, scale):
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    p = n // patch_size
    qkv_bh = _reshape_heads(qkv_sorted, patch_size, num_heads)
    valid_p = valid_sorted.astype(jnp.int32).reshape(b, p, patch_size)
    valid_bh = jnp.broadcast_to(
        valid_p[:, None], (b, num_heads, p, patch_size)
    ).reshape(b * num_heads, p, patch_size)

    out_bh = _pallas_fwd(qkv_bh, valid_bh, scale)
    out = out_bh.reshape(b, num_heads, p, patch_size, d)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, n, c)
    return out, (qkv_sorted, valid_sorted)


def _fwa_bwd(patch_size, num_heads, scale, residuals, g):
    qkv_sorted, valid_sorted = residuals
    b, n, three, c = qkv_sorted.shape
    d = c // num_heads
    if scale is None:
        scale = d**-0.5
    p = n // patch_size
    qkv_bh = _reshape_heads(qkv_sorted, patch_size, num_heads)
    valid_p = valid_sorted.astype(jnp.int32).reshape(b, p, patch_size)
    valid_bh = jnp.broadcast_to(
        valid_p[:, None], (b, num_heads, p, patch_size)
    ).reshape(b * num_heads, p, patch_size)
    do = g.reshape(b, p, patch_size, num_heads, d).transpose(0, 3, 1, 2, 4)
    do_bh = do.reshape(b * num_heads, p, patch_size, d)

    bh = b * num_heads
    grid = (bh, p)
    grad_spec = pl.BlockSpec(
        (1, 1, patch_size, d), lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grad_shape = jax.ShapeDtypeStruct((bh, p, patch_size, d), qkv_bh.dtype)
    dq_bh, dk_bh, dv_bh = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, patch_size, 3, d), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, patch_size), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, patch_size, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[grad_spec, grad_spec, grad_spec],
        out_shape=[grad_shape, grad_shape, grad_shape],
    )(qkv_bh, valid_bh[:, :, None, :], do_bh)

    dqkv_bh = jnp.stack([dq_bh, dk_bh, dv_bh], axis=3)  # [BH, P, K, 3, D]
    dqkv = dqkv_bh.reshape(b, num_heads, p, patch_size, 3, d)
    dqkv = dqkv.transpose(0, 2, 3, 4, 1, 5).reshape(b, n, 3, c)
    return dqkv, None


flash_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
