"""Strided (downsampling) and inverse (upsampling) sparse 3D convolutions.

TPU-native replacement for spconv.SparseConv3d(kernel=2, stride=2) and
spconv.SparseInverseConv3d(kernel=2) as used by the reference SpUNet
(pointcept/models/sparse_unet/spconv_unet_v1m1_base.py:136-183) and MinkUNet.

With kernel 2 / stride 2 every input voxel feeds exactly one output voxel
(its parent, grid_coord >> 1) through the kernel tap selected by the low bits
(grid_coord & 1). The op therefore factors into MXU-friendly pieces:

    y_p = sum_{children c of p} W[tap(c)] @ x_c
        = segment_sum over the parent clustering of (x_c @ W[tap(c)])

where "x @ W[tap(x)]" is 8 masked [B,N,Cin]x[Cin,Cout] matmuls. The parent
clustering is the same sorted-code PoolingPlan used by serialized pooling
(ops/segops.py), so SpUNet shares all geometry machinery with PTv3. The
inverse conv broadcasts parents back to children with transposed taps,
reusing the same plan (spconv ``indice_key`` sharing).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .segops import PoolingPlan, pool_values, unpool_values
from .serialization import take_along_points


def kernel_tap(grid_coord: jnp.ndarray) -> jnp.ndarray:
    """Kernel position of each input voxel in its 2x2x2 parent cell:
    tap = (x&1)<<2 | (y&1)<<1 | (z&1). [B, N, 3] int32 -> [B, N] int32."""
    g = grid_coord.astype(jnp.int32)
    return ((g[..., 0] & 1) << 2) | ((g[..., 1] & 1) << 1) | (g[..., 2] & 1)


def _apply_taps(feat: jnp.ndarray, tap: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-point tap-selected matmul: out[p] = feat[p] @ kernel[tap[p]].

    feat [B, N, Cin], tap [B, N], kernel [8, Cin, Cout] -> [B, N, Cout].
    Eight masked matmuls keep the contraction on the MXU (a per-row kernel
    gather would materialize [B, N, Cin, Cout]).
    """
    out = None
    for k in range(kernel.shape[0]):
        sel = (tap == k)[..., None].astype(feat.dtype)
        contrib = (feat * sel) @ kernel[k].astype(feat.dtype)
        out = contrib if out is None else out + contrib
    return out


def strided_conv_apply(
    feat: jnp.ndarray,
    plan: PoolingPlan,
    grid_coord: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SparseConv3d(kernel=2, stride=2): children -> parents.

    feat [B, N, Cin]; plan: parent clustering (pooling_depth=1 plan over the
    z-serialization of ``grid_coord``); kernel [8, Cin, Cout].
    Returns [B, M, Cout] in the plan's cluster layout.
    """
    tap = kernel_tap(grid_coord)
    contrib = _apply_taps(feat, tap, kernel)
    out = pool_values(plan, contrib, reduce="sum")
    if bias is not None:
        out = out + bias.astype(out.dtype)
    out = jnp.where(plan.out_mask[..., None], out, 0.0).astype(feat.dtype)
    return out


def inverse_conv_apply(
    feat_parent: jnp.ndarray,
    plan: PoolingPlan,
    grid_coord: jnp.ndarray,
    kernel: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SparseInverseConv3d(kernel=2) sharing the downsample's indice_key:
    parents -> children, out[c] = kernel[tap(c)] @ x[parent(c)].

    feat_parent [B, M, Cin]; grid_coord/mask are the *child* level's
    ([B, N, 3] / [B, N]); kernel [8, Cin, Cout]. Returns [B, N, Cout].
    """
    child_feat = unpool_values(feat_parent, plan.cluster_of_point)  # [B, N, Cin]
    tap = kernel_tap(grid_coord)
    out = _apply_taps(child_feat, tap, kernel)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if mask is not None:
        out = jnp.where(mask[..., None], out, 0.0)
    return out.astype(feat_parent.dtype)
