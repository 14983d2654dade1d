"""Submanifold sparse 3D convolution via sorted-code neighbor lookup.

TPU-native replacement for spconv.SubMConv3d, which the reference uses for the
PTv3 stem (kernel 5) and per-block xCPE positional encoding (kernel 3)
(reference: pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:277-287,498-507).

Design: output positions equal input positions (submanifold), so the kernel is
"for each point, gather features of the up-to-K^3 occupied neighbor voxels and
contract with per-offset weight matrices". Neighbor resolution uses a
branchless binary search of the neighbor's z-order code in the scene's sorted
code array (ops.bitops.searchsorted_pair) — the lookup table is built ONCE per
stage and shared by every block in that stage, mirroring the reference's
spconv ``indice_key`` sharing.

The contraction accumulates K^3 gathered [N, Cin] @ [Cin, Cout] matmuls, which
XLA maps onto the MXU; the gathers ride XLA's native gather. (A fused Pallas
gather+matmul kernel is the planned upgrade for the hot path.)
"""

from __future__ import annotations

import itertools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .bitops import SENTINEL_HI, lookup_pair_batched
from .pallas_sort import sort_rows
from .curves import z_order_encode


class SubMConvPlan(NamedTuple):
    """Precomputed neighbor indices for one point set + kernel size.

    neighbor_index: [B, K3, N] int32 — original-layout index of the neighbor
    at each kernel offset (arbitrary where invalid).
    neighbor_valid: [B, K3, N] bool — neighbor voxel occupied & in range.
    """

    neighbor_index: jnp.ndarray
    neighbor_valid: jnp.ndarray
    kernel_size: int


def kernel_offsets(kernel_size: int) -> Tuple[Tuple[int, int, int], ...]:
    r = kernel_size // 2
    return tuple(itertools.product(range(-r, r + 1), repeat=3))


def subplan(plan: SubMConvPlan, kernel_size: int) -> SubMConvPlan:
    """Extract a smaller-kernel plan from a larger one (e.g. k=3 from the
    k=5 stem plan): the 27 offsets are a subset of the 125, so the stage-0
    xCPE plan costs one slice instead of another full-resolution merge-join."""
    # derive the source kernel from the array shape, not plan.kernel_size:
    # plans that crossed a jit boundary (e.g. host-built stem plans passed
    # as arguments) carry kernel_size as a traced scalar
    big_k = round(plan.neighbor_index.shape[1] ** (1 / 3))
    assert kernel_size < big_k
    big = kernel_offsets(big_k)
    idx = [big.index(off) for off in kernel_offsets(kernel_size)]
    import numpy as _np

    sel = _np.asarray(idx)
    return SubMConvPlan(
        neighbor_index=plan.neighbor_index[:, sel],
        neighbor_valid=plan.neighbor_valid[:, sel],
        kernel_size=kernel_size,
    )


def build_subm_conv_plan(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    kernel_size: int = 3,
    depth: int = 16,
    z_sorted: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
    offset_slice: Tuple[int, int] | None = None,
) -> SubMConvPlan:
    """grid_coord [B, N, 3] int32, mask [B, N] bool.

    ``z_sorted`` = (code_hi, code_lo, order) of the z curve (unsorted codes +
    sort permutation, e.g. from ops.serialization) lets the plan reuse the
    serialization sort instead of re-sorting — sorts are the compile- and
    runtime-critical op on TPU, so every stage shares one.

    ``offset_slice=(lo, hi)`` restricts the plan to kernel offsets [lo, hi)
    (neighbor arrays get K3 = hi - lo). The tunneled compile helper SIGKILLs
    programs whose join graphs exceed ~2M elements, so large-N callers build
    the k=5 stem plan in several such programs and concatenate
    (models/ptv3.py:build_ptv3_geometry_staged).
    """
    assert kernel_size % 2 == 1
    n = grid_coord.shape[1]
    limit = jnp.int32((1 << depth) - 1)

    if z_sorted is not None:
        chi, clo, order = z_sorted
        shi = jnp.take_along_axis(chi, order, axis=-1)
        slo = jnp.take_along_axis(clo, order, axis=-1)
    else:
        hi, lo = z_order_encode(grid_coord, depth=depth)
        hi = jnp.where(mask, hi, SENTINEL_HI)
        shi, slo, order = sort_rows(
            (hi, lo, jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)),
            num_keys=2,
        )

    # All kernel offsets resolved by sort-based merge-joins (see
    # bitops.lookup_pair_batched): the matched neighbor's original index rides
    # the scan as payload, so the plan needs zero scalar gathers. Offsets are
    # grouped so each join row stays below ~2M elements: XLA-TPU sort compile
    # memory/time scales superlinearly with row length (a single 8M-row sort
    # OOMs the compiler), while grouped rows become ONE batched sort instance.
    offsets_t = kernel_offsets(kernel_size)
    if offset_slice is not None:
        offsets_t = offsets_t[offset_slice[0] : offset_slice[1]]
    k3 = len(offsets_t)
    b = grid_coord.shape[0]
    target_row = 1 << 20
    group_size = max(1, min(k3, target_row // max(n, 1) - 1))
    g = -(-k3 // group_size)
    k3p = g * group_size
    # pad with out-of-range offsets (never found)
    pad_off = ((1 << 20), (1 << 20), (1 << 20))
    offsets = jnp.asarray(
        offsets_t + (pad_off,) * (k3p - k3), jnp.int32
    )  # [K3p, 3]

    q = grid_coord[:, None, :, :] + offsets[None, :, None, :]  # [B, K3p, N, 3]
    in_range = jnp.all((q >= 0) & (q <= limit), axis=-1) & mask[:, None, :]
    qc = jnp.clip(q, 0, limit)
    qhi, qlo = z_order_encode(qc, depth=depth)  # [B, K3p, N]

    def tile_rows(x):  # [B, N] -> [B*G, N]
        return jnp.broadcast_to(x[:, None], (b, g) + x.shape[1:]).reshape(
            (b * g,) + x.shape[1:]
        )

    nbr, found = lookup_pair_batched(
        tile_rows(shi),
        tile_rows(slo),
        qhi.reshape(b * g, group_size * n),
        qlo.reshape(b * g, group_size * n),
        data_payload=tile_rows(order),
        packed=depth <= 10,
    )
    nbr = nbr.reshape(b, k3p, n)[:, :k3]
    found = found.reshape(b, k3p, n)[:, :k3] & in_range[:, :k3]

    return SubMConvPlan(
        neighbor_index=nbr.astype(jnp.int32),
        neighbor_valid=found,
        kernel_size=kernel_size,
    )


def build_subm_conv_plan_dense(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    kernel_size: int,
    extent: Tuple[int, int, int],
) -> SubMConvPlan:
    """Dense-voxel-grid neighbor plan: scatter each point's index into a
    [B, ex, ey, ez] occupancy grid, then read every point's k^3 neighborhood
    with contiguous-z row gathers.

    ~10x faster than the sort-based merge-join on TPU (measured 4.3 ms vs
    ~44 ms for the k=5 stem at N=32k): one 0.3 ms scatter replaces the
    multi-million-element join sorts, and the k^2 row gathers of k
    z-contiguous cells run at XLA's fast narrow-row gather rate. Costs a
    transient ``4 * B * ex * ey * (ez + k - 1)`` byte buffer, so it requires a
    static per-config ``extent`` that covers all grid coords — callers with
    unbounded scenes use :func:`build_subm_conv_plan` instead. Points with
    ``grid_coord`` outside ``extent`` would silently lose neighbor edges;
    the data pipeline's GridSample bounds coords, and PTv3 exposes the
    extent as an explicit config (``dense_extent``).

    Matches :func:`build_subm_conv_plan` output exactly on one-point-per-voxel
    inputs (GridSample's contract; duplicate-voxel inputs resolve arbitrarily
    in both). Reference parity: spconv SubMConv3d's GPU hash table
    (point_transformer_v3m1_base.py:277-287,498-507), rebuilt as a dense grid
    because TPU scatter/gather beat device hash probes.
    """
    assert kernel_size % 2 == 1
    b, n = mask.shape
    r = kernel_size // 2
    ex, ey, ez = extent
    ezp = ez + 2 * r  # z padding: every in-extent column's k-row is in bounds
    m = ex * ey * ezp
    x = grid_coord[..., 0]
    y = grid_coord[..., 1]
    z = grid_coord[..., 2]

    batch_off = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n), 0) * m
    )
    flat = batch_off + ((x * ey + y) * ezp + (z + r))
    in_extent = (
        (x >= 0) & (x < ex) & (y >= 0) & (y < ey) & (z >= 0) & (z < ez)
    )
    # Masked / out-of-extent points route to index b*m+1 — past the end of
    # the (b*m+1)-element grid, so mode="drop" discards them. That keeps the
    # unique_indices promise honest: live writes hit distinct voxels (the
    # GridSample one-point-per-voxel contract) and dropped writes never
    # collide on a shared dump slot.
    scatter_idx = jnp.where(mask & in_extent, flat, b * m + 1)
    point_id = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1) + 1
    grid = (
        jnp.zeros((b * m + 1,), jnp.int32)
        .at[scatter_idx.reshape(-1)]
        .set(point_id.reshape(-1), mode="drop", unique_indices=True)
    )
    if os.environ.get("SCENESPLAT_DEBUG_EXTENT") == "1":
        n_oob = jnp.sum(mask & ~in_extent)
        jax.debug.print(
            "subm_conv dense plan: {n} valid points outside dense_extent "
            "{e} (losing neighbor edges)", n=n_oob, e=extent,
        )

    cz = jnp.clip(z, 0, ez - 1)  # keep gather rows in bounds for OOB points
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kernel_size), 2)

    # Per-k gather form, adjudicated on v5e (2026-08-20, chained builds at
    # N=32k): k=3 via vmap(dynamic_slice) (one gather, slice_sizes=(3,)) is
    # 11.8 ms vs 15.1 ms for the explicit-index scalar form; k=5 slices are
    # PATHOLOGICAL (953 ms vs 70.9 ms — XLA lowers the 5-wide slice gather
    # into something serial), so k=5 keeps the scalar-index form. Scalar
    # gathers run at ~58M/s on this chip and bound the k=5 build.
    def slice_rows(starts):  # [B, N] int32 -> [B, N, k]
        if kernel_size == 3:
            flat = jax.vmap(
                lambda s: jax.lax.dynamic_slice(grid, (s,), (kernel_size,))
            )(starts.reshape(-1))
            return flat.reshape(b, n, kernel_size)
        idx = starts[..., None] + col_iota  # [B, N, k]
        return grid.at[idx].get(mode="promise_in_bounds")

    rows = []
    valids = []
    for dx in range(-r, r + 1):
        qx = x + dx
        vx = (qx >= 0) & (qx < ex)
        cx = jnp.clip(qx, 0, ex - 1)
        for dy in range(-r, r + 1):
            qy = y + dy
            vy = vx & (qy >= 0) & (qy < ey)
            cy = jnp.clip(qy, 0, ey - 1)
            # row start: z + dz0 + r = z (dz0 = -r); always in [0, ezp - k]
            base = batch_off + (cx * ey + cy) * ezp + cz
            row = slice_rows(base)
            qz = z[..., None] + (col_iota - r)
            vrow = vy[..., None] & (qz >= 0) & (qz < ez) & (z == cz)[..., None]
            rows.append(row)
            valids.append(vrow)
    nbr = jnp.concatenate(rows, axis=-1)  # [B, N, K3] in product order
    vld = jnp.concatenate(valids, axis=-1)
    nbr = jnp.swapaxes(nbr, 1, 2)  # [B, K3, N]
    vld = jnp.swapaxes(vld, 1, 2)
    vld = vld & (nbr > 0) & mask[:, None, :]
    return SubMConvPlan(
        neighbor_index=jnp.maximum(nbr - 1, 0).astype(jnp.int32),
        neighbor_valid=vld,
        kernel_size=kernel_size,
    )


def _gather_rows_masked(feat, indices, valid):
    """Row gather that folds the validity mask into the index: invalid slots
    gather out-of-bounds and fill with zeros. Saves a full [N, C] elementwise
    masking pass per kernel offset (27-125 of them per conv — ~1.3 GB of VPU
    traffic per dec0 conv at 32k)."""
    b, n = feat.shape[:2]
    flat = feat.reshape((b * n,) + feat.shape[2:])
    base = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) * n
    idx = jnp.where(valid, indices.astype(jnp.int32) + base, b * n)
    out = jnp.take(flat, idx.reshape(-1), axis=0, mode="fill", fill_value=0)
    return out.reshape((b, indices.shape[1]) + feat.shape[2:])


def subm_conv_apply(
    feat: jnp.ndarray,
    plan: SubMConvPlan,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """feat [B, N, Cin], weight [K3, Cin, Cout] -> [B, N, Cout].

    Default: 27x unrolled gather+matmul accumulate. A single-fused-gather +
    k-batched-einsum form won the ISOLATED dec0 microbench (8.67 vs
    12.08 ms, probe_conv_variants 2026-08-21) but LOSES in the whole model
    (251-254k vs 265.5k g/s fwd @32k, even gated to wide-channel k=3) —
    XLA's scheduling of the big [B,K3,N,C] gather differs in context. Kept
    behind SCENESPLAT_CONV_APPLY=fused for future adjudication. (A single
    wide [N, K3*Cin] gather + one flat matmul — a THIRD form — compiles
    pathologically on this toolchain.)
    """
    k3 = weight.shape[0]
    assert k3 == plan.neighbor_index.shape[1]
    if os.environ.get("SCENESPLAT_CONV_APPLY") == "fused":
        b, n = feat.shape[:2]
        flat = feat.reshape((b * n,) + feat.shape[2:])
        base = jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) * n
        idx = jnp.where(
            plan.neighbor_valid,
            plan.neighbor_index.astype(jnp.int32) + base,
            b * n,
        )  # [B, K3, N]
        g = jnp.take(flat, idx.reshape(-1), axis=0, mode="fill", fill_value=0)
        g = g.reshape(b, k3, n, feat.shape[2])
        out = jnp.einsum(
            "bknc,kcd->bnd", g, weight, preferred_element_type=jnp.float32
        ).astype(feat.dtype)
        if bias is not None:
            out = out + bias
        return out
    out = None
    for k in range(k3):
        g = _gather_rows_masked(
            feat, plan.neighbor_index[:, k], plan.neighbor_valid[:, k]
        )
        term = jnp.einsum(
            "bnc,cd->bnd", g, weight[k], preferred_element_type=jnp.float32
        )
        out = term if out is None else out + term
    out = out.astype(feat.dtype)
    if bias is not None:
        out = out + bias
    return out


def subm_dwconv_apply(
    feat: jnp.ndarray,
    plan: SubMConvPlan,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depthwise submanifold conv (OctFormer's OctreeDWConv,
    octformer_v1m1_base.py:143-160): feat [B, N, C], weight [K3, C] ->
    [B, N, C]; per-offset gathered FMAs instead of matmuls."""
    k3 = weight.shape[0]
    assert k3 == plan.neighbor_index.shape[1]
    out = None
    for k in range(k3):
        g = _gather_rows_masked(
            feat, plan.neighbor_index[:, k], plan.neighbor_valid[:, k]
        )
        term = g * weight[k].astype(feat.dtype)
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
