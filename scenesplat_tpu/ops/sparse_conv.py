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

import itertools
from typing import Optional, Tuple

import jax.numpy as jnp

from .bitops import lookup_pair_batched
from .curves import z_order_encode
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


def build_corner_lookup(
    parent_z_sorted: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    child_grid: jnp.ndarray,
    child_mask: jnp.ndarray,
    depth: int,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve each child voxel's up-to-8 corner parents.

    For child coord c, the parents reachable by a corner-anchored stride-2
    stencil are exactly ``(c >> 1) + e`` for ``e in {0,1}^3`` (gated by the
    child's per-axis parity; see :func:`deconv_k3s2_apply`). Resolves all 8
    candidates against the parent level's sorted z-codes with the same
    merge-join used by ``ops.subm_conv.build_subm_conv_plan`` — no scalar
    gathers, join rows capped below ~2^20 elements.

    parent_z_sorted: (code_hi, code_lo, order) of the parent level ([B, M]
    unsorted codes + sort permutation, i.e. ``ser.code_hi[0]`` etc.).
    Returns (corner_index [B, 8, N] int32 into the parent layout,
    corner_found [B, 8, N] bool), corners enumerated x-major
    (idx = ex*4 + ey*2 + ez).
    """
    chi, clo, order = parent_z_sorted
    shi = jnp.take_along_axis(chi, order, axis=-1)
    slo = jnp.take_along_axis(clo, order, axis=-1)

    b, n = child_mask.shape
    corners = jnp.asarray(
        tuple(itertools.product((0, 1), repeat=3)), jnp.int32
    )  # [8, 3]
    q = (child_grid >> 1)[:, None, :, :] + corners[None, :, None, :]
    qhi, qlo = z_order_encode(q, depth=depth)  # [B, 8, N]

    # group corners so each join row stays under ~2^20 elements (XLA sort
    # compile cost scales superlinearly with row length; see subm_conv)
    group_size = max(1, min(8, (1 << 20) // max(n, 1)))
    g = -(-8 // group_size)
    pad = g * group_size - 8
    if pad:
        # pad corner rows are sliced off below ([:, :8]); fill is arbitrary
        qhi = jnp.concatenate([qhi, jnp.zeros((b, pad, n), qhi.dtype)], axis=1)
        qlo = jnp.concatenate([qlo, jnp.zeros((b, pad, n), qlo.dtype)], axis=1)

    def tile_rows(x):
        return jnp.broadcast_to(x[:, None], (b, g) + x.shape[1:]).reshape(
            (b * g,) + x.shape[1:]
        )

    idx, found = lookup_pair_batched(
        tile_rows(shi),
        tile_rows(slo),
        qhi.reshape(b * g, group_size * n),
        qlo.reshape(b * g, group_size * n),
        data_payload=tile_rows(order),
        packed=packed,
    )
    idx = idx.reshape(b, g * group_size, n)[:, :8]
    found = found.reshape(b, g * group_size, n)[:, :8] & child_mask[:, None]
    return idx.astype(jnp.int32), found


def deconv_k3s2_apply(
    feat_parent: jnp.ndarray,
    corner_index: jnp.ndarray,
    corner_found: jnp.ndarray,
    child_grid: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Corner-anchored 27-tap stride-2 transposed conv: parents -> children.

    TPU-native equivalent of ocnn's OctreeDeconv(kernel=[3], stride=2) as
    used by the reference OctFormer decoder head
    (pointcept/models/octformer/octformer_v1m1_base.py:402-426):

        out[c] = sum_{p : c - 2p in (-1..1)^3} x[p] @ W[c - 2p]

    Writing c = 2*(c>>1) + r with parity r in {0,1}^3, the contributing
    parents are p = (c>>1) + e for e in {0,1}^3 with e <= r bitwise, and the
    tap offset is delta = r - 2e per axis. That turns the stencil into 8
    wide row gathers (one per corner, from :func:`build_corner_lookup`) and
    27 masked [B,N,Cin]x[Cin,Cout] matmuls — the same MXU shape as the
    forward 27-tap conv. Taps are enumerated x-major over delta in
    (-1,0,1)^3 (t = (dx+1)*9 + (dy+1)*3 + (dz+1)), matching
    ``ops.subm_conv.kernel_offsets``.

    feat_parent [B, M, Cin]; corner_index/corner_found [B, 8, N];
    child_grid [B, N, 3]; kernel [27, Cin, Cout]. Returns [B, N, Cout].
    """
    r = (child_grid & 1).astype(jnp.int32)  # [B, N, 3]
    out = None
    for e_idx, e in enumerate(itertools.product((0, 1), repeat=3)):
        gathered = take_along_points(feat_parent, corner_index[:, e_idx])
        found_e = corner_found[:, e_idx]
        for rp in itertools.product((0, 1), repeat=3):
            delta = tuple(rp[a] - 2 * e[a] for a in range(3))
            if any(d < -1 or d > 1 for d in delta):
                continue
            t = (delta[0] + 1) * 9 + (delta[1] + 1) * 3 + (delta[2] + 1)
            sel = found_e & jnp.all(
                r == jnp.asarray(rp, jnp.int32), axis=-1
            )
            contrib = (gathered * sel[..., None].astype(gathered.dtype)) @ kernel[
                t
            ].astype(gathered.dtype)
            out = contrib if out is None else out + contrib
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if mask is not None:
        out = jnp.where(mask[..., None], out, 0.0)
    return out.astype(feat_parent.dtype)
