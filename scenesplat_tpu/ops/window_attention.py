"""Serialized window (patch) attention.

TPU-native replacement for the reference's flash_attn_varlen over serialized
patches (pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:172-222).
The reference pads every scene to a multiple of ``patch_size`` by duplicating
points; here the batch is already a fixed padded [B, N] layout with padding
sorted last, so attention is plain block-diagonal attention over contiguous
patches of the sorted sequence with a key-validity mask — exactly the shape the
MXU wants: [B*P, H, K, K] batched matmuls.

Two implementations:
  - ``window_attention_reference``: pure-jnp, scanned over patch chunks to
    bound memory. Differentiable, used as ground truth.
  - a Pallas flash-window kernel (ops/pallas_attn.py) that keeps the K x K
    score tile in VMEM and never materializes scores in HBM — the default on
    TPU (see ``window_attention``).
"""

from __future__ import annotations

import functools

import os
import warnings

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@functools.lru_cache(maxsize=None)
def _pallas_probe_ok(patch_size: int, num_heads: int, c: int,
                     dtype_name: str) -> bool:
    """One-time fwd+bwd compile probe of the Pallas kernel on the real backend.

    Mosaic layout errors surface only at a real-TPU compile (interpret-mode
    tests provably cannot catch them — the round-1 bwd kernel passed every
    interpret test yet had never compiled on hardware). So before the default
    dispatch trusts the kernel for a given instantiation class, compile a tiny
    B=1, P=1 instance of the exact (K, H, C, dtype) signature and fall back to
    the jnp reference path on any failure. Cached per signature; the probe
    costs one small Mosaic compile.
    """
    from .pallas_attn import flash_window_attention

    dtype = jnp.dtype(dtype_name)
    qkv = jnp.zeros((1, patch_size, 3, c), dtype)
    valid = jnp.ones((1, patch_size), bool)

    def loss(q):
        out = flash_window_attention(q, valid, patch_size, num_heads)
        return out.astype(jnp.float32).sum()

    try:
        jax.jit(jax.grad(loss)).lower(qkv).compile()
        return True
    except Exception as e:  # Mosaic rejection, VMEM overflow, ...
        warnings.warn(
            "Pallas flash-window attention failed to compile for "
            f"(K={patch_size}, H={num_heads}, C={c}, {dtype_name}): {e!r}; "
            "falling back to the jnp reference attention for this signature."
        )
        return False


def _masked_softmax(scores, key_valid):
    """Masked-exp softmax: e = where(valid, exp(s - max_valid), 0).

    TPU_TODO item 7 variant: replaces the -1e9 bias add + full softmax with a
    select around exp, saving one K-wide add and letting the max/sum reduce
    run over the same select mask. Rows with zero valid keys produce zeros
    (the biased softmax produces uniform junk there; both are masked
    downstream, but zeros keep the backward NaN-free without a bias tensor).
    Enabled via SCENESPLAT_MASKED_EXP=1 (read at trace time).
    """
    valid = key_valid[..., None, None, :]
    m = jnp.max(jnp.where(valid, scores, -jnp.inf), axis=-1, keepdims=True)
    m = jnp.maximum(m, jnp.float32(-1e30))  # all-invalid rows: finite shift
    # clamp the exponent to <= 0: exact for valid entries (m is their max),
    # and keeps exp's primal finite at masked entries so its VJP never
    # multiplies a zero cotangent by inf (NaN)
    e = jnp.where(valid, jnp.exp(jnp.minimum(scores - m, 0.0)), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def _patch_attention(q, k, v, key_valid, scale, upcast_softmax=True):
    """q,k,v: [..., K, H, D]; key_valid: [..., K] bool."""
    qh = jnp.swapaxes(q, -2, -3)  # [..., H, K, D]
    kh = jnp.swapaxes(k, -2, -3)
    vh = jnp.swapaxes(v, -2, -3)
    scores = jnp.einsum(
        "...hqd,...hkd->...hqk", qh * scale, kh, preferred_element_type=jnp.float32
    )
    # default ON since the v5e A/B (2026-08-21): 265.5k vs 247.0k g/s fwd
    # @32k — the select-around-exp saves a K-wide bias add and a pass over
    # the score tensor; value+grad parity is pinned by tests
    if os.environ.get("SCENESPLAT_MASKED_EXP", "1") != "0":
        attn = _masked_softmax(scores.astype(jnp.float32), key_valid).astype(
            vh.dtype
        )
    else:
        bias = jnp.where(key_valid[..., None, None, :], 0.0, NEG_INF)
        scores = scores + bias
        if upcast_softmax:
            scores = scores.astype(jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum(
        "...hqk,...hkd->...hqd", attn, vh, preferred_element_type=jnp.float32
    ).astype(vh.dtype)
    return jnp.swapaxes(out, -2, -3)  # [..., K, H, D]


def window_attention_reference(
    qkv_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    patch_size: int,
    num_heads: int,
    scale: float | None = None,
    patch_chunk: int = 8,
    upcast_softmax: bool = True,
) -> jnp.ndarray:
    """Block-diagonal attention over serialized patches (jnp reference).

    qkv_sorted: [B, N, 3, H*D] already gathered into curve order.
    valid_sorted: [B, N] bool — padding keys are masked out.
    Returns [B, N, H*D]. ``patch_chunk`` patches are processed per scan step
    to keep the score tensor off HBM.
    """
    b, n, three, c = qkv_sorted.shape
    assert three == 3 and n % patch_size == 0
    h = num_heads
    d = c // h
    if scale is None:
        scale = d**-0.5
    p = n // patch_size
    # never pad past the real patch count (at 4k points / patch 1024 the
    # default chunk of 8 would make half the score tensor padding)
    patch_chunk = max(1, min(patch_chunk, p))

    qkv = qkv_sorted.reshape(b, p, patch_size, 3, h, d)
    valid = valid_sorted.reshape(b, p, patch_size)

    # pad patch count to a multiple of patch_chunk
    pad = (-p) % patch_chunk
    if pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((b, pad) + qkv.shape[2:], qkv.dtype)], axis=1
        )
        valid = jnp.concatenate(
            [valid, jnp.zeros((b, pad, patch_size), bool)], axis=1
        )
    chunks = (p + pad) // patch_chunk
    qkv = qkv.reshape(b, chunks, patch_chunk, patch_size, 3, h, d)
    valid = valid.reshape(b, chunks, patch_chunk, patch_size)

    def step(_, xs):
        qkv_c, valid_c = xs  # [B, chunk, K, 3, H, D], [B, chunk, K]
        q, k, v = qkv_c[..., 0, :, :], qkv_c[..., 1, :, :], qkv_c[..., 2, :, :]
        out = _patch_attention(q, k, v, valid_c, scale, upcast_softmax)
        return None, out

    _, out = jax.lax.scan(
        step, None, (jnp.swapaxes(qkv, 0, 1), jnp.swapaxes(valid, 0, 1))
    )
    out = jnp.swapaxes(out, 0, 1)  # [B, chunks, chunk, K, H, D]
    out = out.reshape(b, (p + pad) * patch_size, c)
    return out[:, : n]


def _head_pad_dim(c: int, num_heads: int) -> int | None:
    """Padded per-head dim for the Pallas kernel, or None when no pad helps.

    The kernel tiles channels in head-groups of Cg = lcm(d, 128) lanes and
    UNROLLS the heads within a group (ops/pallas_attn.py). At the flagship
    d = 48 that means Cg = 384 and an 8-way unroll whose Mosaic compile cost
    is pathological (measured 814 s at K=1024, C=768). Padding each head to
    the next power of two that divides 128 (48 -> 64) makes Cg = 128 and the
    unroll 128/d' <= 2 — ~4x less unrolled code — at the price of one
    elementwise pad/slice round trip (bandwidth, not MXU). Zero-padded q/k
    lanes contribute nothing to scores and zero-padded v lanes produce
    zeros that the output slice drops, so the math is exact.
    """
    d = c // num_heads
    if d >= 128 or 128 % d == 0:
        return None  # already lane-friendly (Cg = 128 tile, small unroll)
    dp = 1 << (d - 1).bit_length()  # next power of two, divides 128
    return dp


def window_attention(
    qkv_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    patch_size: int,
    num_heads: int,
    scale: float | None = None,
    use_pallas: bool | None = None,
    upcast_softmax: bool = True,
) -> jnp.ndarray:
    """Dispatch to the Pallas flash-window kernel on TPU, else the jnp path.

    ``upcast_softmax`` only affects the jnp path (reference
    point_transformer_v3m1_base.py:161: softmax in the attention dtype when
    False); the Pallas kernel keeps its running max/sum statistics in fp32
    regardless, flash-attention style."""
    c = qkv_sorted.shape[-1]
    # Head padding defaults ON: measured on v5e (WINDOW_LOG 2026-08-20) the
    # padded flagship kernel compiles in 12.3 s fwd / 36.7 s bwd vs 814 s
    # unpadded, at parity runtime (7.4 ms fwd @32k/C=768). Opt out with
    # SCENESPLAT_ATTN_PAD_HEAD=0.
    pad_d = (
        _head_pad_dim(c, num_heads)
        if os.environ.get("SCENESPLAT_ATTN_PAD_HEAD", "1") != "0"
        else None
    )
    eff_c = num_heads * pad_d if pad_d else c
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
        if os.environ.get("SCENESPLAT_NO_PALLAS_ATTN") == "1":
            use_pallas = False  # manual override for Mosaic regressions
            # (only overrides the default — an explicit use_pallas=True wins)
        # Hybrid dispatch (DEFAULT min_d=32): Pallas only pays off at wide
        # heads — small-d stages are cheap in jnp, and their Mosaic bwd
        # compiles (8-way head unrolls at Cg=128) are what pushed the
        # flagship train-step compile over the tunnel helper's memory cap
        # (SIGKILL after ~54 min, 2026-08-20). With d >= 32 only (dec0/
        # dec1), the same program compiles in ~25 min and runs 56.6k g/s.
        # Set SCENESPLAT_PALLAS_MIN_D=0 to force Pallas everywhere.
        min_d = int(os.environ.get("SCENESPLAT_PALLAS_MIN_D", "32"))
        if use_pallas and c // num_heads < min_d:
            use_pallas = False
        if use_pallas:
            # auto-fallback: never hard-crash train/test on a Mosaic rejection
            use_pallas = _pallas_probe_ok(
                patch_size, num_heads, eff_c, str(qkv_sorted.dtype),
            )
    if use_pallas:
        from .pallas_attn import flash_window_attention

        if pad_d is not None:
            b, n = qkv_sorted.shape[:2]
            d = c // num_heads
            if scale is None:
                scale = d**-0.5  # scale follows the REAL head dim
            qkv6 = qkv_sorted.reshape(b, n, 3, num_heads, d)
            qkv6 = jnp.pad(
                qkv6, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad_d - d))
            )
            out = flash_window_attention(
                qkv6.reshape(b, n, 3, eff_c), valid_sorted, patch_size,
                num_heads, scale,
            )
            return out.reshape(b, n, num_heads, pad_d)[..., :d].reshape(
                b, n, c
            )
        return flash_window_attention(
            qkv_sorted, valid_sorted, patch_size, num_heads, scale
        )
    return window_attention_reference(
        qkv_sorted, valid_sorted, patch_size, num_heads, scale,
        upcast_softmax=upcast_softmax,
    )


def window_attention_rpe(
    qkv_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    grid_sorted: jnp.ndarray,
    rpe_table: jnp.ndarray,
    patch_size: int,
    num_heads: int,
    scale: float | None = None,
    patch_chunk: int = 4,
) -> jnp.ndarray:
    """Dense window attention with the PTv3 relative-position bias
    (reference RPE, point_transformer_v3m1_base.py:29-48 + enable_rpe path
    l.183-207): per-axis relative *grid* coordinates of window members index
    a [3 * (2*bnd+1), H] table whose three axis entries sum into the logits.

    grid_sorted: [B, N, 3] int32 gathered into curve order;
    rpe_table: [3 * rpe_num, H] with rpe_num = 2*pos_bnd+1,
    pos_bnd = int((4*patch_size)**(1/3) * 2).
    """
    b, n, three, c = qkv_sorted.shape
    assert three == 3 and n % patch_size == 0
    h = num_heads
    d = c // h
    if scale is None:
        scale = d**-0.5
    p = n // patch_size
    pos_bnd = int((4 * patch_size) ** (1 / 3) * 2)
    rpe_num = 2 * pos_bnd + 1

    qkv = qkv_sorted.reshape(b, p, patch_size, 3, h, d)
    valid = valid_sorted.reshape(b, p, patch_size)
    grid = grid_sorted.reshape(b, p, patch_size, 3)

    pad = (-p) % patch_chunk
    if pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((b, pad) + qkv.shape[2:], qkv.dtype)], axis=1)
        valid = jnp.concatenate(
            [valid, jnp.zeros((b, pad, patch_size), bool)], axis=1)
        grid = jnp.concatenate(
            [grid, jnp.zeros((b, pad, patch_size, 3), grid.dtype)], axis=1)
    chunks = (p + pad) // patch_chunk
    qkv = qkv.reshape(b, chunks, patch_chunk, patch_size, 3, h, d)
    valid = valid.reshape(b, chunks, patch_chunk, patch_size)
    grid = grid.reshape(b, chunks, patch_chunk, patch_size, 3)

    def step(_, xs):
        qkv_c, valid_c, grid_c = xs
        q, k, v = qkv_c[..., 0, :, :], qkv_c[..., 1, :, :], qkv_c[..., 2, :, :]
        rel = grid_c[..., :, None, :] - grid_c[..., None, :, :]  # [B,c,K,K,3]
        idx = jnp.clip(rel, -pos_bnd, pos_bnd) + pos_bnd
        bias = 0.0
        for axis in range(3):
            bias = bias + jnp.take(
                rpe_table[axis * rpe_num:(axis + 1) * rpe_num],
                idx[..., axis], axis=0,
            )  # [B, c, K, K, H]
        bias = jnp.moveaxis(bias, -1, -3)  # [B, c, H, K, K]

        qh = jnp.swapaxes(q, -2, -3)
        kh = jnp.swapaxes(k, -2, -3)
        vh = jnp.swapaxes(v, -2, -3)
        scores = jnp.einsum(
            "...hqd,...hkd->...hqk", qh * scale, kh,
            preferred_element_type=jnp.float32,
        ) + bias.astype(jnp.float32)
        scores = scores + jnp.where(
            valid_c[..., None, None, :], 0.0, NEG_INF)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vh.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, vh,
                         preferred_element_type=jnp.float32).astype(vh.dtype)
        return None, jnp.swapaxes(out, -2, -3)

    _, out = jax.lax.scan(
        step, None,
        (jnp.swapaxes(qkv, 0, 1), jnp.swapaxes(valid, 0, 1),
         jnp.swapaxes(grid, 0, 1)),
    )
    out = jnp.swapaxes(out, 0, 1).reshape(b, (p + pad) * patch_size, c)
    return out[:, :n]
