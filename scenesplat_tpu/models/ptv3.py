"""Point Transformer V3 backbone, TPU-native.

Re-design of the reference PTv3
(pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py) for
fixed-shape padded batches on TPU:

  - serialized attention -> Pallas flash-window kernel over contiguous patches
    of the curve-sorted sequence (ops/pallas_attn.py); padding is masked, not
    duplicated (reference pads by duplicating points, l.115-170).
  - spconv SubMConv3d (stem k=5, xCPE k=3) -> sorted-z-code binary-search
    gather + per-offset matmul accumulation (ops/subm_conv.py); the neighbor
    plan is built once per stage and shared by all blocks in the stage,
    mirroring spconv's ``indice_key`` sharing (reference l.283,639).
  - SerializedPooling/Unpooling -> cumsum-over-sorted-codes clustering with
    static per-stage capacity buckets (ops/segops.py; reference l.341-482).
  - BatchNorm1d -> MaskedBatchNorm excluding padding slots (models/norm.py).

Every stage keeps static shapes; per-stage point capacities shrink by
``stage_capacity`` fractions (padding-safe upper bounds on cluster counts),
keeping deep-stage compute proportional to real point counts.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.segops import (
    PoolingPlan,
    build_pooling_plan,
    pool_serialization,
    pool_values,
    unpool_values,
)
from scenesplat_tpu.ops.serialization import Serialization, take_along_points
from scenesplat_tpu.ops.hash_grid import build_subm_conv_plan_hash
from scenesplat_tpu.ops.subm_conv import (
    SubMConvPlan,
    build_subm_conv_plan,
    build_subm_conv_plan_dense,
    subm_conv_apply,
    subplan,
)
from scenesplat_tpu.ops.window_attention import window_attention
from .builder import MODELS
from .norm import LayerNorm, MaskedBatchNorm, PDNorm
from .structure import PointBatch


class StageState(NamedTuple):
    """Per-stage geometry shared by all blocks of the stage."""

    coord: jnp.ndarray
    grid_coord: jnp.ndarray
    mask: jnp.ndarray
    ser: Serialization
    conv_plan: SubMConvPlan


class PDCfg(NamedTuple):
    """PDNorm conditioning config threaded through PTv3 (reference pdnorm_*
    flags, point_transformer_v3m1_base.py:518-636 + PPT)."""

    conditions: Tuple[str, ...]
    bn: bool = True
    ln: bool = True
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256


def _cond_ln(features, dtype, name, pd: Optional[PDCfg]):
    """LayerNorm or prompt-driven LayerNorm factory; returns apply(x, cond)."""
    if pd is None or not pd.ln:
        mod = LayerNorm(features, dtype=dtype, name=name)
        return lambda x, cond: mod(x)
    mod = PDNorm(
        features=features, conditions=pd.conditions, norm_type="ln",
        decouple=pd.decouple, adaptive=pd.adaptive,
        context_channels=pd.context_channels, dtype=dtype, name=name,
    )
    return lambda x, cond: mod(x, cond[0], context=cond[1])


def _cond_bn(features, dtype, name, pd: Optional[PDCfg]):
    """MaskedBatchNorm or prompt-driven BN factory; apply(x, mask, ra, cond)."""
    if pd is None or not pd.bn:
        mod = MaskedBatchNorm(features, dtype=dtype, name=name)
        return lambda x, mask, ra, cond: mod(x, mask, use_running_average=ra)
    mod = PDNorm(
        features=features, conditions=pd.conditions, norm_type="bn",
        decouple=pd.decouple, adaptive=pd.adaptive,
        context_channels=pd.context_channels, dtype=dtype, name=name,
    )
    return lambda x, mask, ra, cond: mod(
        x, cond[0], mask=mask, context=cond[1], use_running_average=ra)


def _gelu(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU parity


class SubMConv(nn.Module):
    """Parameter holder applying ops.subm_conv (spconv.SubMConv3d stand-in).

    ``trunc_normal_std`` switches to trunc-normal init (SpUNet's _init_weights
    convention, spconv_unet_v1m1_base.py:228-240); default is torch
    kaiming-uniform conv init.
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    trunc_normal_std: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, plan: SubMConvPlan):
        k3 = self.kernel_size**3
        if self.trunc_normal_std is not None:
            kernel = self.param(
                "kernel",
                nn.initializers.truncated_normal(self.trunc_normal_std),
                (k3, self.in_channels, self.out_channels),
                jnp.float32,
            )
        else:
            # fan-in init matching torch kaiming-uniform default for convs.
            # The centering must live INSIDE the initializer: a post-`param`
            # shift would re-apply to restored checkpoint weights on every
            # call (caught by tests/test_full_model_golden.py).
            bound = 1.0 / math.sqrt(self.in_channels * k3)

            def _kaiming_uniform(key, shape, dtype=jnp.float32):
                return jax.random.uniform(
                    key, shape, dtype, minval=-bound, maxval=bound
                )

            kernel = self.param(
                "kernel",
                _kaiming_uniform,
                (k3, self.in_channels, self.out_channels),
            )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            if self.use_bias
            else None
        )
        return subm_conv_apply(
            feat.astype(self.dtype), plan, kernel.astype(self.dtype),
            None if bias is None else bias.astype(self.dtype),
        )


class MLP(nn.Module):
    channels: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool):
        hidden = int(self.channels * self.mlp_ratio)
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class SerializedAttention(nn.Module):
    """Window attention over one curve order (reference l.51-222)."""

    channels: int
    num_heads: int
    patch_size: int
    order_index: int = 0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    upcast_softmax: bool = True
    enable_rpe: bool = False
    use_pallas: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: StageState, deterministic: bool):
        c, h = self.channels, self.num_heads
        scale = self.qk_scale or (c // h) ** -0.5
        order = state.ser.curve_order(self.order_index)
        inverse = state.ser.curve_inverse(self.order_index)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(feat)
        qkv_sorted = take_along_points(qkv, order).reshape(
            qkv.shape[0], qkv.shape[1], 3, c
        )
        valid_sorted = take_along_points(
            state.mask.astype(jnp.int32), order
        ).astype(bool)
        if self.enable_rpe:
            # dense path with the relative-position bias table (reference
            # RPE l.29-48; forced non-flash like the reference enable_rpe)
            from scenesplat_tpu.ops.window_attention import window_attention_rpe

            pos_bnd = int((4 * self.patch_size) ** (1 / 3) * 2)
            rpe_table = self.param(
                "rpe_table", nn.initializers.truncated_normal(0.02),
                (3 * (2 * pos_bnd + 1), h), jnp.float32,
            )
            grid_sorted = take_along_points(state.grid_coord, order)
            out_sorted = window_attention_rpe(
                qkv_sorted, valid_sorted, grid_sorted, rpe_table,
                patch_size=self.patch_size, num_heads=h, scale=scale,
            )
        else:
            out_sorted = window_attention(
                qkv_sorted,
                valid_sorted,
                patch_size=self.patch_size,
                num_heads=h,
                scale=scale,
                use_pallas=self.use_pallas,
                upcast_softmax=self.upcast_softmax,
            )
        out = take_along_points(out_sorted, inverse)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """xCPE + pre-norm attention + pre-norm MLP (reference l.251-338)."""

    channels: int
    num_heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    pre_norm: bool = True
    order_index: int = 0
    upcast_softmax: bool = True
    enable_rpe: bool = False
    use_pallas: Optional[bool] = None
    pd: Optional[PDCfg] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: StageState, deterministic: bool,
                 cond=(None, None), cpe_feat=None):
        c = self.channels
        ln = lambda name: _cond_ln(c, self.dtype, name, self.pd)  # noqa: E731
        # drop_path == per-point residual-branch dropout (timm DropPath on a
        # packed [N, C] buffer drops per point)
        droppath = nn.Dropout(
            self.drop_path, broadcast_dims=(2,), deterministic=deterministic,
            name="drop_path",
        )

        shortcut = feat
        # cpe_feat: reference-parity override for the first post-unpooling
        # block, whose xCPE conv reads the un-resynced sparse features (see
        # SerializedUnpooling docstring)
        x = SubMConv(c, c, kernel_size=3, use_bias=True, dtype=self.dtype,
                     name="cpe_conv")(
            feat if cpe_feat is None else cpe_feat, state.conv_plan)
        x = nn.Dense(c, dtype=self.dtype, name="cpe_linear")(x)
        x = ln("cpe_norm")(x, cond)
        feat = shortcut + x

        shortcut = feat
        if self.pre_norm:
            feat = ln("norm1")(feat, cond)
        feat = SerializedAttention(
            channels=c,
            num_heads=self.num_heads,
            patch_size=self.patch_size,
            order_index=self.order_index,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            upcast_softmax=self.upcast_softmax,
            enable_rpe=self.enable_rpe,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )(feat, state, deterministic)
        feat = shortcut + droppath(feat)
        if not self.pre_norm:
            feat = ln("norm1")(feat, cond)

        shortcut = feat
        if self.pre_norm:
            feat = ln("norm2")(feat, cond)
        feat = MLP(channels=c, mlp_ratio=self.mlp_ratio, drop=self.proj_drop,
                   dtype=self.dtype, name="mlp")(feat, deterministic)
        feat = shortcut + droppath(feat)
        if not self.pre_norm:
            feat = ln("norm2")(feat, cond)
        return feat


class SerializedPooling(nn.Module):
    """Grid pooling by right-shifted codes (reference l.341-444).

    With precomputed geometry (``plan`` + ``pooled_state``), only the
    parameterized reduce path runs — the int-only cluster construction lives
    in the separate geometry program (see build_ptv3_geometry)."""

    in_channels: int
    out_channels: int
    stride: int = 2
    reduce: str = "mean"
    packed: bool = False
    pd: Optional[PDCfg] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: StageState, out_capacity: int,
                 deterministic: bool, plan: Optional[PoolingPlan] = None,
                 pooled_state: Optional["StageState"] = None,
                 cond=(None, None)):
        pooling_depth = (math.ceil(self.stride) - 1).bit_length()
        if plan is None:
            plan = build_pooling_plan(
                state.ser, state.mask, out_capacity, pooling_depth
            )
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(feat)
        x = pool_values(plan, x, self.reduce)
        if pooled_state is None:
            coord = pool_values(plan, state.coord, "mean")
            grid_coord = (
                take_along_points(state.grid_coord, plan.head_index)
                >> pooling_depth
            )
            ser = pool_serialization(plan, state.ser, pooling_depth,
                                     packed=self.packed)
            mask = plan.out_mask
        else:
            coord, grid_coord = pooled_state.coord, pooled_state.grid_coord
            ser, mask = pooled_state.ser, pooled_state.mask
        x = _cond_bn(self.out_channels, self.dtype, "norm", self.pd)(
            x, mask, deterministic, cond
        )
        x = _gelu(x)
        return x, coord, grid_coord, mask, ser, plan


class SerializedUnpooling(nn.Module):
    """Broadcast pooled feats back to parent points + skip (reference l.447-482)."""

    in_channels: int
    skip_channels: int
    out_channels: int
    pd: Optional[PDCfg] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, parent_feat, parent_mask, mask, plan: PoolingPlan,
                 deterministic: bool, cond=(None, None)):
        """Returns (unpooled_feat, skip_proj_feat). The second output exists
        for reference parity: the reference's unpooling assigns the summed
        feat directly (point_transformer_v3m1_base.py:480) WITHOUT re-syncing
        point.sparse_conv_feat, so the first decoder block's xCPE conv reads
        the proj_skip features, not the sum (modules.py:80-84 syncs only on
        torch/spconv module calls). Blocks after the first see the synced
        sum."""
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(feat)
        x = _cond_bn(self.out_channels, self.dtype, "proj_norm", self.pd)(
            x, mask, deterministic, cond
        )
        x = _gelu(x)
        skip = nn.Dense(self.out_channels, dtype=self.dtype, name="proj_skip")(parent_feat)
        skip = _cond_bn(self.out_channels, self.dtype, "proj_skip_norm", self.pd)(
            skip, parent_mask, deterministic, cond)
        skip = _gelu(skip)
        return skip + unpool_values(x, plan.cluster_of_point), skip


class Embedding(nn.Module):
    """Stem: submanifold conv k=5 + BN + GELU (reference l.485-515)."""

    in_channels: int
    embed_channels: int
    pd: Optional[PDCfg] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, plan: SubMConvPlan, mask, deterministic: bool,
                 cond=(None, None)):
        x = SubMConv(
            self.in_channels, self.embed_channels, kernel_size=5,
            use_bias=False, dtype=self.dtype, name="conv",
        )(feat, plan)
        x = _cond_bn(self.embed_channels, self.dtype, "norm", self.pd)(
            x, mask, deterministic, cond
        )
        return _gelu(x)


def _round_capacity(n: int, frac: float, patch: int) -> int:
    cap = max(patch, int(math.ceil(n * frac / patch)) * patch)
    return min(cap, max(patch, int(math.ceil(n / patch)) * patch))


class PTv3Geometry(NamedTuple):
    """All int-only geometry of a PTv3 forward: serialization, conv plans,
    pooling plans, per-stage coords/masks. Computed by
    ``build_ptv3_geometry`` — its own (gradient-free) jitted program, so the
    network program's compile graph carries no sort networks. This halves
    compile memory on the tunneled TPU toolchain (see CLAUDE.md) and skips
    re-differentiating integer plumbing."""

    point: PointBatch  # input point with serialization attached
    stem_plan: SubMConvPlan
    states: Tuple[StageState, ...]  # one per encoder stage
    plans: Tuple[PoolingPlan, ...]  # one per pooling (num_stages - 1)


def _shrunk_extent(extent, total_depth):
    return tuple((e + (1 << total_depth) - 1) >> total_depth for e in extent)


def stem_plan_from_batch(batch, kernel_size: int = 5):
    """SubMConvPlan from host-built batch keys (transforms.HostConvPlan):
    ``stem_nbr``/``stem_valid`` arrive point-major [B, N, K3] (contiguous
    host writes); the device layout is [B, K3, N] — one cheap transpose."""
    if "stem_nbr" not in batch:
        return None
    return SubMConvPlan(
        neighbor_index=jnp.swapaxes(jnp.asarray(batch["stem_nbr"]), 1, 2),
        neighbor_valid=jnp.swapaxes(jnp.asarray(batch["stem_valid"]), 1, 2),
        kernel_size=kernel_size,
    )


def build_ptv3_geometry(
    point: PointBatch,
    *,
    orders: Sequence[str],
    depth: int = 16,
    num_stages: int = 5,
    strides: Sequence[int] = (2, 2, 2, 2),
    capacities: Sequence[int] = (),
    shuffle_rng: Optional[jax.Array] = None,
    dense_extent: Optional[Tuple[int, int, int]] = None,
    hash_grid: bool = False,
    pool_reduce_needs_coord: bool = True,
    stem_plan: Optional[SubMConvPlan] = None,
) -> PTv3Geometry:
    """Mirror of PTv3's in-forward geometry construction (serialization,
    stem k=5 plan + per-stage k=3 plans, pooling cluster plans).

    ``stem_plan``: a precomputed full-resolution stem conv plan (e.g. built
    on the HOST by the data-loader workers, native/host_ops.cpp:
    subm_dense_plan, and shipped as batch inputs). The stem plan is ~90% of
    the device geometry cost (the k=5 ~4.1M-scalar-gather build, measured
    71 of 77 ms at 32k on v5e) and is a pure function of grid_coord — with
    it supplied, the device only serializes + pools + builds the small
    pooled-stage k=3 plans.

    ``dense_extent``: when the scene's grid coords are bounded by a static
    (ex, ey, ez), conv plans build via the dense-voxel-grid path
    (ops.subm_conv.build_subm_conv_plan_dense, ~10x faster than the
    merge-join sorts on TPU); extent shrinks with each pooling stride.
    ``hash_grid``: UNBOUNDED scenes (outdoor: HoliCity / KITTI-360) route
    conv plans through the bucketized hash table (ops.hash_grid) — the
    dense path's scatter+row-gather structure without the O(extent^3)
    buffer, and no join sort networks in the compile graph.
    """
    if point.ser is None:
        point = point.serialized(orders, depth=depth, shuffle_rng=shuffle_rng)
    z_idx = orders.index("z") if "z" in orders else None

    def _z_sorted(ser):
        if z_idx is None:
            return None
        return (ser.code_hi[z_idx], ser.code_lo[z_idx], ser.order[z_idx])

    def conv_plan(grid_coord, mask, k, ser, total_depth):
        if dense_extent is not None:
            return build_subm_conv_plan_dense(
                grid_coord, mask, kernel_size=k,
                extent=_shrunk_extent(dense_extent, total_depth),
            )
        if hash_grid:
            return build_subm_conv_plan_hash(
                grid_coord, mask, kernel_size=k, depth=depth
            )
        return build_subm_conv_plan(
            grid_coord, mask, kernel_size=k, depth=depth,
            z_sorted=_z_sorted(ser),
        )

    if stem_plan is None:
        stem_plan = conv_plan(point.grid_coord, point.mask, 5, point.ser, 0)
    state = StageState(
        coord=point.coord, grid_coord=point.grid_coord, mask=point.mask,
        ser=point.ser, conv_plan=subplan(stem_plan, 3),
    )
    states = [state]
    plans = []
    total_depth = 0
    for s in range(1, num_stages):
        pooling_depth = (math.ceil(strides[s - 1]) - 1).bit_length()
        total_depth += pooling_depth
        plan = build_pooling_plan(
            state.ser, state.mask, capacities[s - 1], pooling_depth
        )
        coord = pool_values(plan, state.coord, "mean")
        grid_coord = (
            take_along_points(state.grid_coord, plan.head_index) >> pooling_depth
        )
        ser = pool_serialization(plan, state.ser, pooling_depth,
                                 packed=depth <= 10)
        state = StageState(
            coord=coord, grid_coord=grid_coord, mask=plan.out_mask, ser=ser,
            conv_plan=conv_plan(grid_coord, plan.out_mask, 3, ser, total_depth),
        )
        plans.append(plan)
        states.append(state)
    return PTv3Geometry(
        point=point, stem_plan=stem_plan, states=tuple(states),
        plans=tuple(plans),
    )


# --- staged geometry -------------------------------------------------------
# One jitted program per construction step. Identical results to
# build_ptv3_geometry inside a single jit, but the tunneled toolchain's
# compile time grows superlinearly with the fused geometry graph at
# N >= 64k (hours, vs minutes for the pieces), so large-N callers compile
# the steps separately at ~28 ms/step dispatch overhead. Programs are
# cached by (static config, shapes) via jax.jit.


@functools.partial(jax.jit, static_argnames=("orders", "depth", "do_shuffle"))
def _geom_serialize(point, shuffle_rng, *, orders, depth, do_shuffle):
    return point.serialized(
        orders, depth=depth, shuffle_rng=shuffle_rng if do_shuffle else None
    )


def _z_sorted_of(ser, orders):
    if "z" not in orders:
        return None
    z_idx = orders.index("z")
    return (ser.code_hi[z_idx], ser.code_lo[z_idx], ser.order[z_idx])


# per-program element budget for conv-plan merge-joins: the tunneled
# compile helper SIGKILLs join graphs much past ~2M elements (measured:
# 0.9M compiles in ~50 s, 8.3M is killed), so staged conv plans split the
# kernel offsets across programs of at most this many (offsets+1) x N
# elements each
_JOIN_ELEMS_PER_PROGRAM = int(
    os.environ.get("SCENESPLAT_JOIN_ELEMS_PER_PROGRAM", 1_500_000)
)


@functools.partial(
    jax.jit, static_argnames=("k", "depth", "has_z", "lo", "hi")
)
def _geom_conv_chunk(grid_coord, mask, z_sorted, *, k, depth, has_z, lo, hi):
    plan = build_subm_conv_plan(
        grid_coord, mask, kernel_size=k, depth=depth,
        z_sorted=z_sorted if has_z else None, offset_slice=(lo, hi),
    )
    return plan.neighbor_index, plan.neighbor_valid


def _staged_conv_plan(grid_coord, mask, z_sorted, *, k, depth):
    """Conv plan via as many jitted programs as the join budget requires."""
    n = grid_coord.shape[1]
    k3 = k**3
    per = max(1, _JOIN_ELEMS_PER_PROGRAM // max(n, 1) - 1)
    nbr, valid = [], []
    for lo in range(0, k3, per):
        hi = min(lo + per, k3)
        nb, va = _geom_conv_chunk(
            grid_coord, mask, z_sorted, k=k, depth=depth,
            has_z=z_sorted is not None, lo=lo, hi=hi,
        )
        nbr.append(nb)
        valid.append(va)
    return SubMConvPlan(
        neighbor_index=jnp.concatenate(nbr, axis=1) if len(nbr) > 1 else nbr[0],
        neighbor_valid=(
            jnp.concatenate(valid, axis=1) if len(valid) > 1 else valid[0]
        ),
        kernel_size=k,
    )


@functools.partial(
    jax.jit, static_argnames=("cap", "pooling_depth", "depth")
)
def _geom_pool(ser, mask, coord, grid_coord, *, cap, pooling_depth, depth):
    plan = build_pooling_plan(ser, mask, cap, pooling_depth)
    new_coord = pool_values(plan, coord, "mean")
    new_grid = take_along_points(grid_coord, plan.head_index) >> pooling_depth
    new_ser = pool_serialization(plan, ser, pooling_depth, packed=depth <= 10)
    return plan, new_coord, new_grid, new_ser


@functools.partial(
    jax.jit,
    static_argnames=(
        "cap", "pooling_depth", "depth", "z_idx", "dense_extent", "hash_grid"
    ),
)
def _geom_pool_conv(ser, mask, coord, grid_coord, *, cap, pooling_depth,
                    depth, z_idx, dense_extent=None, hash_grid=False):
    """Fused stage step: pooling + the pooled stage's k=3 conv plan in ONE
    program. Every tunnel dispatch costs ~28 ms RPC floor and dispatches
    serialize, so the staged path's program count is its throughput cap at
    large N; the pooled k=3 join (28 x cap elements) fits the compile budget
    whenever cap <= ~50k (any cap with the dense-grid plan)."""
    plan, new_coord, new_grid, new_ser = _geom_pool(
        ser, mask, coord, grid_coord, cap=cap, pooling_depth=pooling_depth,
        depth=depth,
    )
    if dense_extent is not None:
        conv_plan = build_subm_conv_plan_dense(
            new_grid, plan.out_mask, kernel_size=3, extent=dense_extent
        )
        return plan, new_coord, new_grid, new_ser, conv_plan
    if hash_grid:
        conv_plan = build_subm_conv_plan_hash(
            new_grid, plan.out_mask, kernel_size=3, depth=depth
        )
        return plan, new_coord, new_grid, new_ser, conv_plan
    zs = (
        (new_ser.code_hi[z_idx], new_ser.code_lo[z_idx], new_ser.order[z_idx])
        if z_idx is not None
        else None
    )
    conv_plan = build_subm_conv_plan(
        new_grid, plan.out_mask, kernel_size=3, depth=depth, z_sorted=zs
    )
    return plan, new_coord, new_grid, new_ser, conv_plan


@functools.partial(jax.jit, static_argnames=("k", "extent"))
def _geom_conv_dense(grid_coord, mask, *, k, extent):
    return build_subm_conv_plan_dense(grid_coord, mask, kernel_size=k,
                                      extent=extent)


@functools.partial(jax.jit, static_argnames=("k", "depth"))
def _geom_conv_hash(grid_coord, mask, *, k, depth):
    return build_subm_conv_plan_hash(grid_coord, mask, kernel_size=k,
                                     depth=depth)


def build_ptv3_geometry_staged(
    point: PointBatch,
    *,
    orders: Sequence[str],
    depth: int = 16,
    num_stages: int = 5,
    strides: Sequence[int] = (2, 2, 2, 2),
    capacities: Sequence[int] = (),
    shuffle_rng: Optional[jax.Array] = None,
    dense_extent: Optional[Tuple[int, int, int]] = None,
    hash_grid: bool = False,
    stem_plan: Optional[SubMConvPlan] = None,
) -> PTv3Geometry:
    """build_ptv3_geometry semantics through per-step jitted programs."""
    orders = tuple(orders)
    if point.ser is None:
        rng = shuffle_rng if shuffle_rng is not None else jax.random.PRNGKey(0)
        point = _geom_serialize(
            point, rng, orders=orders, depth=depth,
            do_shuffle=shuffle_rng is not None,
        )
    has_z = "z" in orders
    z_idx = orders.index("z") if has_z else None
    if stem_plan is not None:
        pass  # host-built (see build_ptv3_geometry)
    elif dense_extent is not None:
        stem_plan = _geom_conv_dense(
            point.grid_coord, point.mask, k=5, extent=tuple(dense_extent)
        )
    elif hash_grid:
        stem_plan = _geom_conv_hash(
            point.grid_coord, point.mask, k=5, depth=depth
        )
    else:
        z_sorted = _z_sorted_of(point.ser, orders)
        stem_plan = _staged_conv_plan(
            point.grid_coord, point.mask, z_sorted, k=5, depth=depth
        )
    state = StageState(
        coord=point.coord, grid_coord=point.grid_coord, mask=point.mask,
        ser=point.ser, conv_plan=subplan(stem_plan, 3),
    )
    states = [state]
    plans = []
    total_depth = 0
    for s in range(1, num_stages):
        pooling_depth = (math.ceil(strides[s - 1]) - 1).bit_length()
        total_depth += pooling_depth
        cap = capacities[s - 1]
        stage_extent = (
            _shrunk_extent(dense_extent, total_depth)
            if dense_extent is not None
            else None
        )
        if (stage_extent is not None or hash_grid
                or 28 * cap <= _JOIN_ELEMS_PER_PROGRAM):
            # one dispatch for pooling + the stage's conv plan
            plan, coord, grid_coord, ser, conv_plan = _geom_pool_conv(
                state.ser, state.mask, state.coord, state.grid_coord,
                cap=cap, pooling_depth=pooling_depth, depth=depth,
                z_idx=z_idx, dense_extent=stage_extent, hash_grid=hash_grid,
            )
        else:
            plan, coord, grid_coord, ser = _geom_pool(
                state.ser, state.mask, state.coord, state.grid_coord,
                cap=cap, pooling_depth=pooling_depth, depth=depth,
            )
            zs = (
                (ser.code_hi[z_idx], ser.code_lo[z_idx], ser.order[z_idx])
                if has_z
                else None
            )
            conv_plan = _staged_conv_plan(
                grid_coord, plan.out_mask, zs, k=3, depth=depth
            )
        state = StageState(
            coord=coord, grid_coord=grid_coord, mask=plan.out_mask, ser=ser,
            conv_plan=conv_plan,
        )
        plans.append(plan)
        states.append(state)
    return PTv3Geometry(
        point=point, stem_plan=stem_plan, states=tuple(states),
        plans=tuple(plans),
    )


@MODELS.register_module("PT-v3m1")
class PointTransformerV3(nn.Module):
    """Flagship backbone (reference l.518-714; flagship VL config:
    configs/concat_dataset/lang-pretrain-...-contrastive.py:22-54)."""

    in_channels: int = 6
    order: Tuple[str, ...] = ("z", "z-trans")
    stride: Tuple[int, ...] = (2, 2, 2, 2)
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_num_head: Tuple[int, ...] = (2, 4, 8, 16, 32)
    enc_patch_size: Tuple[int, ...] = (48, 48, 48, 48, 48)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_channels: Tuple[int, ...] = (64, 64, 128, 256)
    dec_num_head: Tuple[int, ...] = (4, 4, 8, 16)
    dec_patch_size: Tuple[int, ...] = (48, 48, 48, 48)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.3
    pre_norm: bool = True
    shuffle_orders: bool = True
    upcast_softmax: bool = True
    enable_rpe: bool = False
    cls_mode: bool = False
    # PDNorm conditioning (reference pdnorm_* flags + PPT)
    pdnorm_conditions: Optional[Tuple[str, ...]] = None
    pdnorm_bn: bool = True
    pdnorm_ln: bool = True
    pdnorm_decouple: bool = True
    pdnorm_adaptive: bool = False
    context_channels: int = 256
    # jax.checkpoint each transformer block: trades recompute for activation
    # memory AND shrinks the fwd+bwd compile graph (tunnel compile-memory
    # lead, CLAUDE.md); mirrors the reference enable_checkpoint flags
    remat_blocks: bool = False
    pool_reduce: str = "mean"
    serialization_depth: int = 16
    # static (ex, ey, ez) bound on grid coords: enables the dense-voxel-grid
    # conv-plan builder (~10x faster than merge-join sorts on TPU). Must
    # cover every scene's grid extent; None = sort-based join path.
    dense_extent: Optional[Tuple[int, int, int]] = None
    # UNBOUNDED scenes (outdoor): build conv plans via the bucketized hash
    # grid (ops.hash_grid) — dense-path structure without the extent bound.
    # Mutually exclusive with dense_extent (dense wins if both set).
    hash_grid: bool = False
    # static per-stage point-capacity fractions (upper bounds on cluster
    # counts after each stride-2 pooling; surfaces shrink ~4x per level)
    stage_capacity: Optional[Tuple[float, ...]] = None
    use_pallas: Optional[bool] = None
    # SSL support (reference point_transformer_v3m1_ssl.py:585-591,724-751):
    # a learnable token replaces embedded features at masked points, and the
    # encoder output (coarsest stage) can be returned alongside the decoder
    enable_mask_token: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_stages(self):
        return len(self.enc_depths)

    def geometry_capacities(self, n0: int) -> Tuple[int, ...]:
        """Static per-stage cluster capacities (for build_ptv3_geometry)."""
        caps = self.stage_capacity or tuple(
            0.5**s for s in range(1, self.num_stages)
        )
        return tuple(
            _round_capacity(n0, caps[s - 1], self.enc_patch_size[s])
            for s in range(1, self.num_stages)
        )

    def build_geometry(
        self, point: PointBatch, shuffle_rng: Optional[jax.Array] = None,
        stem_plan: Optional[SubMConvPlan] = None,
    ) -> "PTv3Geometry":
        """Precompute the int-only geometry program for this config.

        ``stem_plan``: optional host-built stem conv plan (see
        build_ptv3_geometry)."""
        orders = self.order if not isinstance(self.order, str) else (self.order,)
        return build_ptv3_geometry(
            point,
            orders=orders,
            depth=self.serialization_depth,
            num_stages=self.num_stages,
            strides=self.stride,
            capacities=self.geometry_capacities(point.num_points),
            shuffle_rng=shuffle_rng,
            dense_extent=self.dense_extent,
            hash_grid=self.hash_grid,
            stem_plan=stem_plan,
        )

    def build_geometry_staged(
        self, point: PointBatch, shuffle_rng: Optional[jax.Array] = None,
        stem_plan: Optional[SubMConvPlan] = None,
    ) -> "PTv3Geometry":
        """build_geometry through per-step jitted programs (large-N path).

        Identical results; each step compiles within the tunneled compile
        helper's memory cap, unlocking N >= 64k (CLAUDE.md round-1 notes).
        """
        orders = self.order if not isinstance(self.order, str) else (self.order,)
        return build_ptv3_geometry_staged(
            point,
            orders=orders,
            depth=self.serialization_depth,
            num_stages=self.num_stages,
            strides=self.stride,
            capacities=self.geometry_capacities(point.num_points),
            shuffle_rng=shuffle_rng,
            dense_extent=self.dense_extent,
            hash_grid=self.hash_grid,
            stem_plan=stem_plan,
        )

    @nn.compact
    def __call__(
        self,
        point: PointBatch,
        train: bool = False,
        token_mask: Optional[jnp.ndarray] = None,
        return_enc: bool = False,
        geometry: Optional[PTv3Geometry] = None,
        condition_index=None,
        context=None,
    ):
        deterministic = not train
        pd = (
            PDCfg(
                conditions=tuple(self.pdnorm_conditions),
                bn=self.pdnorm_bn, ln=self.pdnorm_ln,
                decouple=self.pdnorm_decouple, adaptive=self.pdnorm_adaptive,
                context_channels=self.context_channels,
            )
            if self.pdnorm_conditions
            else None
        )
        cond = (
            condition_index if condition_index is not None
            else jnp.zeros((), jnp.int32),
            context,
        )
        num_stages = self.num_stages
        orders = self.order if not isinstance(self.order, str) else (self.order,)
        caps = self.stage_capacity or tuple(
            0.5**s for s in range(1, num_stages)
        )
        assert len(caps) == num_stages - 1

        if geometry is not None:
            # geometry supplies serialization + plans; features always come
            # from the PASSED point (taking geometry.point.feat here once
            # silently discarded the caller's features, making chained
            # benchmarks loop-invariant — XLA hoisted the whole network out
            # of the rep loop and reported 5x-too-fast numbers, r5 bisect)
            point = geometry.point.replace(feat=point.feat)
        elif point.ser is None:
            shuffle_rng = (
                self.make_rng("shuffle")
                if (train and self.shuffle_orders and len(orders) > 1)
                else None
            )
            point = point.serialized(
                orders, depth=self.serialization_depth, shuffle_rng=shuffle_rng
            )

        n0 = point.num_points
        feat = point.feat.astype(self.dtype)

        # physical curve index of "z": its serialization sort doubles as the
        # conv lookup table (z-codes >> 3 stay z-codes through pooling)
        z_idx = orders.index("z") if "z" in orders else None

        def _z_sorted(ser):
            if z_idx is None:
                return None
            return (ser.code_hi[z_idx], ser.code_lo[z_idx], ser.order[z_idx])

        def _conv_plan(grid_coord, mask, k, ser, total_depth):
            if self.dense_extent is not None:
                return build_subm_conv_plan_dense(
                    grid_coord, mask, kernel_size=k,
                    extent=_shrunk_extent(self.dense_extent, total_depth),
                )
            if self.hash_grid:
                return build_subm_conv_plan_hash(
                    grid_coord, mask, kernel_size=k,
                    depth=self.serialization_depth,
                )
            return build_subm_conv_plan(
                grid_coord, mask, kernel_size=k,
                depth=self.serialization_depth, z_sorted=_z_sorted(ser),
            )

        if geometry is not None:
            stem_plan = geometry.stem_plan
            state = geometry.states[0]
        else:
            # ONE full-resolution merge-join builds the k=5 stem plan; the
            # k=3 xCPE plan for stage 0 is a 27-offset slice of it
            stem_plan = _conv_plan(
                point.grid_coord, point.mask, 5, point.ser, 0
            )
            state = StageState(
                coord=point.coord,
                grid_coord=point.grid_coord,
                mask=point.mask,
                ser=point.ser,
                conv_plan=subplan(stem_plan, 3),
            )
        feat = Embedding(
            self.in_channels, self.enc_channels[0], pd=pd, dtype=self.dtype,
            name="embedding",
        )(feat, stem_plan, state.mask, deterministic, cond=cond)
        if self.enable_mask_token:
            mask_token = self.param(
                "mask_token", nn.initializers.truncated_normal(0.02),
                (self.enc_channels[0],), jnp.float32,
            ).astype(feat.dtype)
            if token_mask is not None:
                # the reference's `org_feat[mask] = mask_token`
                # (point_transformer_v3m1_ssl.py:736) mutates IN PLACE the
                # storage shared with point.sparse_conv_feat, so unlike the
                # decoder-unpooling case the first block's xCPE sees the
                # MASKED features — plain substitution is exact parity
                feat = jnp.where(token_mask[..., None], mask_token, feat)

        import numpy as _np

        # static_argnums counts the module itself at 0: (self, feat, state,
        # deterministic, cond) -> deterministic is arg 3
        BlockCls = (
            nn.remat(Block, static_argnums=(3,)) if self.remat_blocks else Block
        )

        enc_dp = [
            float(x) for x in
            _np.linspace(0, self.drop_path, sum(self.enc_depths))
        ]
        skips = []  # (feat, state, plan) at each pre-pooling resolution

        for s in range(num_stages):
            if s > 0:
                cap = _round_capacity(n0, caps[s - 1], self.enc_patch_size[s])
                pooled = SerializedPooling(
                    in_channels=self.enc_channels[s - 1],
                    out_channels=self.enc_channels[s],
                    stride=self.stride[s - 1],
                    reduce=self.pool_reduce,
                    packed=self.serialization_depth <= 10,
                    pd=pd,
                    dtype=self.dtype,
                    name=f"enc{s}_down",
                )(feat, state, cap, deterministic,
                  plan=geometry.plans[s - 1] if geometry is not None else None,
                  pooled_state=geometry.states[s] if geometry is not None else None,
                  cond=cond)
                x, coord, grid_coord, mask, ser, plan = pooled
                skips.append((feat, state, plan))
                feat = x
                if geometry is not None:
                    state = geometry.states[s]
                else:
                    total_depth = sum(
                        (math.ceil(self.stride[t]) - 1).bit_length()
                        for t in range(s)
                    )
                    state = StageState(
                        coord=coord, grid_coord=grid_coord, mask=mask, ser=ser,
                        conv_plan=_conv_plan(
                            grid_coord, mask, 3, ser, total_depth
                        ),
                    )
            for i in range(self.enc_depths[s]):
                feat = BlockCls(
                    channels=self.enc_channels[s],
                    num_heads=self.enc_num_head[s],
                    patch_size=self.enc_patch_size[s],
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    attn_drop=self.attn_drop,
                    proj_drop=self.proj_drop,
                    drop_path=enc_dp[sum(self.enc_depths[:s]) + i],
                    pre_norm=self.pre_norm,
                    order_index=i % len(orders),
                    upcast_softmax=self.upcast_softmax,
                    enable_rpe=self.enable_rpe,
                    use_pallas=self.use_pallas,
                    pd=pd,
                    dtype=self.dtype,
                    name=f"enc{s}_block{i}",
                )(feat, state, deterministic, cond=cond)

        enc_feat, enc_mask = feat, state.mask  # coarsest-stage encoder output

        if not self.cls_mode:
            dec_dp = [
                float(x) for x in
                _np.linspace(0, self.drop_path, sum(self.dec_depths))
            ]
            dec_channels = list(self.dec_channels) + [self.enc_channels[-1]]
            for s in reversed(range(num_stages - 1)):
                parent_feat, parent_state, plan = skips.pop()
                feat, stale_cpe_feat = SerializedUnpooling(
                    in_channels=dec_channels[s + 1],
                    skip_channels=self.enc_channels[s],
                    out_channels=dec_channels[s],
                    pd=pd,
                    dtype=self.dtype,
                    name=f"dec{s}_up",
                )(feat, parent_feat, parent_state.mask, state.mask, plan,
                  deterministic, cond=cond)
                state = parent_state
                dp_slice = dec_dp[
                    sum(self.dec_depths[:s]) : sum(self.dec_depths[: s + 1])
                ][::-1]
                for i in range(self.dec_depths[s]):
                    feat = BlockCls(
                        channels=dec_channels[s],
                        num_heads=self.dec_num_head[s],
                        patch_size=self.dec_patch_size[s],
                        mlp_ratio=self.mlp_ratio,
                        qkv_bias=self.qkv_bias,
                        qk_scale=self.qk_scale,
                        attn_drop=self.attn_drop,
                        proj_drop=self.proj_drop,
                        drop_path=dp_slice[i],
                        pre_norm=self.pre_norm,
                        order_index=i % len(orders),
                        upcast_softmax=self.upcast_softmax,
                        enable_rpe=self.enable_rpe,
                        use_pallas=self.use_pallas,
                        pd=pd,
                        dtype=self.dtype,
                        name=f"dec{s}_block{i}",
                    )(feat, state, deterministic, cond=cond,
                      cpe_feat=stale_cpe_feat if i == 0 else None)

        out = point.replace(
            feat=feat,
            coord=state.coord,
            grid_coord=state.grid_coord,
            mask=state.mask,
            ser=state.ser,
        )
        if return_enc:
            return out, enc_feat, enc_mask
        return out
