"""Point Transformer V2 backbone, TPU-native.

Re-design of the reference PTv2
(pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py) for
fixed-shape padded batches:

  - pointops.knn_query -> tiled brute-force matmul kNN (ops/pointops.knn);
    one reference_index per BlockSequence, like the reference (l.222-226).
  - pointops.grouping -> masked wide row gathers (ops/pointops.grouping).
  - torch_geometric.voxel_grid + torch.unique GridPool (l.227-268) ->
    sorted-z-code cluster plans with static per-stage capacity
    (ops/pointops.grid_cluster_plan + ops/segops).
  - PointBatchNorm -> MaskedBatchNorm excluding padding (and invalid
    neighbor slots for grouped tensors).
  - "map" unpooling -> cluster-id row gather; "interp" -> IDW 3-NN
    interpolation (ops/pointops.interpolation), reference l.271-310.

``grouped_linear=True`` reproduces PT-v2m1's GroupedLinear weight encoding
(point_transformer_v2m1_origin.py:24-61); m2 ("recommended") disables it.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as _np

from scenesplat_tpu.ops import pointops as po
from scenesplat_tpu.ops.segops import PoolingPlan, pool_values, unpool_values
from .builder import MODELS
from .norm import MaskedBatchNorm
from .structure import PointBatch


class PointsState(NamedTuple):
    coord: jnp.ndarray  # [B, N, 3]
    mask: jnp.ndarray  # [B, N]


class PointBN(nn.Module):
    """PointBatchNorm analogue: BN over valid slots of [B, N, C] or
    [B, N, K, C] (reference point_transformer_v2m2_base.py:25-43).

    ``conditions`` switches to prompt-driven PDNorm (PT-v2m3,
    point_transformer_v2m3_pdnorm.py:26-77); ``cond`` = (condition_index,
    context)."""

    features: int
    dtype: jnp.dtype = jnp.float32  # second positional for legacy call sites
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256

    @nn.compact
    def __call__(self, x, mask, deterministic: bool, cond=(None, None)):
        shape = x.shape
        if x.ndim == 4:
            x = x.reshape(shape[0], shape[1] * shape[2], shape[3])
            mask = jnp.broadcast_to(mask[..., None] if mask.ndim == 2 else mask,
                                    shape[:3]).reshape(shape[0], -1)
        if self.conditions is None:
            # reference PointBatchNorm wraps a DEFAULT BatchNorm1d
            # (eps=1e-5, momentum=0.1) — unlike PTv3's eps=1e-3 convention
            y = MaskedBatchNorm(self.features, eps=1e-5, momentum=0.1,
                                dtype=self.dtype, name="norm")(
                x, mask, use_running_average=deterministic
            )
        else:
            from .norm import PDNorm

            cidx = cond[0] if cond[0] is not None else jnp.zeros((), jnp.int32)
            y = PDNorm(
                features=self.features, conditions=tuple(self.conditions),
                norm_type="bn", decouple=self.pd_decouple,
                adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype,
                name="pdnorm",
            )(x, cidx, mask=mask, context=cond[1],
              use_running_average=deterministic)
        return y.reshape(shape)


class GroupedVectorAttention(nn.Module):
    """Reference GroupedVectorAttention (l.46-129) on padded neighbor slots.

    Invalid slots (idx == -1) contribute zeroed relations; like the reference
    they stay in the softmax denominator and are zeroed afterwards via
    ``sign(idx + 1)`` (l.123-124).
    """

    embed_channels: int
    groups: int
    attn_drop_rate: float = 0.0
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, ref_index, deterministic: bool,
                 cond=(None, None)):
        c, g = self.embed_channels, self.groups

        def bn(feats, x, mask, name):
            return PointBN(
                feats, self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
                name=name,
            )(x, mask, deterministic, cond=cond)

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="linear_q")(feat)
        q = nn.relu(bn(c, q, state.mask, "bn_q"))
        k = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="linear_k")(feat)
        k = nn.relu(bn(c, k, state.mask, "bn_k"))
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="linear_v")(feat)

        kg = po.grouping(ref_index, k, state.coord, query_coord=state.coord,
                         with_xyz=True)
        vg = po.grouping(ref_index, v, state.coord, with_xyz=False)
        pos, kg = kg[..., :3], kg[..., 3:]
        relation = kg - q[:, :, None, :]
        slot_ok = ref_index >= 0
        if self.pe_multiplier:
            pem = nn.Dense(c, dtype=self.dtype, name="pe_mul_fc1")(pos)
            pem = nn.relu(bn(c, pem, slot_ok, "pe_mul_bn"))
            pem = nn.Dense(c, dtype=self.dtype, name="pe_mul_fc2")(pem)
            relation = relation * pem
        if self.pe_bias:
            peb = nn.Dense(c, dtype=self.dtype, name="pe_bias_fc1")(pos)
            peb = nn.relu(bn(c, peb, slot_ok, "pe_bias_bn"))
            peb = nn.Dense(c, dtype=self.dtype, name="pe_bias_fc2")(peb)
            relation = relation + peb
            vg = vg + peb

        if self.grouped_linear:
            # GroupedLinear (m1, point_transformer_v2m1_origin.py:24-61):
            # per-channel weights summed within each group
            gw = self.param("grouped_weight",
                            nn.initializers.lecun_normal(), (1, c), jnp.float32)
            w = (relation * gw.astype(relation.dtype)).reshape(
                relation.shape[:-1] + (g, c // g)).sum(-1)
        else:
            w = nn.Dense(g, dtype=self.dtype, name="weight_fc1")(relation)
        w = nn.relu(bn(g, w, slot_ok, "weight_bn"))
        w = nn.Dense(g, dtype=self.dtype, name="weight_fc2")(w)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=2).astype(self.dtype)
        w = nn.Dropout(self.attn_drop_rate, deterministic=deterministic)(w)
        w = w * slot_ok[..., None].astype(w.dtype)
        return po.aggregation(vg, w, g)


class Block(nn.Module):
    """fc1 -> GVA -> fc3 with BN/ReLU and residual (reference l.132-177)."""

    embed_channels: int
    groups: int
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, ref_index, deterministic: bool,
                 cond=(None, None)):
        c = self.embed_channels

        def bn(x, name):
            return PointBN(
                c, self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
                name=name,
            )(x, state.mask, deterministic, cond=cond)

        identity = feat
        x = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc1")(feat)
        x = nn.relu(bn(x, "norm1"))
        x = GroupedVectorAttention(
            embed_channels=c, groups=self.groups, qkv_bias=self.qkv_bias,
            pe_multiplier=self.pe_multiplier, pe_bias=self.pe_bias,
            grouped_linear=self.grouped_linear,
            attn_drop_rate=self.attn_drop_rate,
            conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype, name="attn",
        )(x, state, ref_index, deterministic, cond=cond)
        x = nn.relu(bn(x, "norm2"))
        x = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc3")(x)
        x = bn(x, "norm3")
        x = nn.Dropout(self.drop_path_rate, broadcast_dims=(2,),
                       deterministic=deterministic, name="drop_path")(x)
        return nn.relu(identity + x)


class BlockSequence(nn.Module):
    """kNN once per resolution, then ``depth`` blocks (reference l.180-226)."""

    depth: int
    embed_channels: int
    groups: int
    neighbours: int = 16
    qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False
    attn_drop_rate: float = 0.0
    drop_path_rates: Tuple[float, ...] = ()
    knn_tile: int = 512
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, deterministic: bool,
                 cond=(None, None)):
        ref_index, _ = po.knn(state.coord, state.mask, self.neighbours,
                              tile=self.knn_tile)
        rates = self.drop_path_rates or tuple(0.0 for _ in range(self.depth))
        for i in range(self.depth):
            feat = Block(
                embed_channels=self.embed_channels, groups=self.groups,
                qkv_bias=self.qkv_bias, pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias, grouped_linear=self.grouped_linear,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rate=rates[i],
                conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype, name=f"block{i}",
            )(feat, state, ref_index, deterministic, cond=cond)
        return feat


class GridPool(nn.Module):
    """Partition-based grid pooling (reference l.229-268): fc+BN+ReLU, then
    voxel clustering — coord mean, feat max."""

    in_channels: int
    out_channels: int
    grid_size: float
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, out_capacity: int,
                 deterministic: bool, cond=(None, None)):
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="fc")(feat)
        x = nn.relu(PointBN(
            self.out_channels, self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
            name="norm",
        )(x, state.mask, deterministic, cond=cond))
        plan = po.grid_cluster_plan(state.coord, state.mask, self.grid_size,
                                    out_capacity)
        coord = pool_values(plan, state.coord, "mean")
        x = pool_values(plan, x, "max")
        new_state = PointsState(coord=coord, mask=plan.out_mask)
        return x, new_state, plan


class UnpoolWithSkip(nn.Module):
    """Map/interp unpooling with skip connection (reference l.271-310)."""

    in_channels: int
    skip_channels: int
    out_channels: int
    backend: str = "map"
    skip: bool = True
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, skip_feat,
                 skip_state: PointsState, plan: Optional[PoolingPlan],
                 deterministic: bool, cond=(None, None)):
        x = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(feat)
        x = nn.relu(PointBN(
            self.out_channels, self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
            name="proj_norm",
        )(x, state.mask, deterministic, cond=cond))
        if self.backend == "map" and plan is not None:
            x = unpool_values(x, plan.cluster_of_point)
        else:
            x = po.interpolation(state.coord, state.mask, skip_state.coord,
                                 skip_state.mask, x)
        if self.skip:
            s = nn.Dense(self.out_channels, dtype=self.dtype, name="proj_skip")(skip_feat)
            s = nn.relu(PointBN(
                self.out_channels, self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
                name="proj_skip_norm",
            )(s, skip_state.mask, deterministic, cond=cond))
            x = x + s
        return x


@MODELS.register_module("PT-v2m2")
class PointTransformerV2(nn.Module):
    """Reference PT-v2m2 (point_transformer_v2m2_base.py:446-579). Takes a
    PointBatch, returns it with seg logits (num_classes>0) or decoder feats."""

    in_channels: int
    num_classes: int = 0
    patch_embed_depth: int = 1
    patch_embed_channels: int = 48
    patch_embed_groups: int = 6
    patch_embed_neighbours: int = 8
    enc_depths: Tuple[int, ...] = (2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (96, 192, 384, 512)
    enc_groups: Tuple[int, ...] = (12, 24, 48, 64)
    enc_neighbours: Tuple[int, ...] = (16, 16, 16, 16)
    dec_depths: Tuple[int, ...] = (1, 1, 1, 1)
    dec_channels: Tuple[int, ...] = (48, 96, 192, 384)
    dec_groups: Tuple[int, ...] = (6, 12, 24, 48)
    dec_neighbours: Tuple[int, ...] = (16, 16, 16, 16)
    grid_sizes: Tuple[float, ...] = (0.06, 0.12, 0.24, 0.48)
    attn_qkv_bias: bool = True
    pe_multiplier: bool = False
    pe_bias: bool = True
    grouped_linear: bool = False  # True reproduces PT-v2m1
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    unpool_backend: str = "map"
    # static cluster-capacity fractions per encoder stage (of input N)
    stage_capacity: Tuple[float, ...] = (0.75, 0.4, 0.2, 0.1)
    knn_tile: int = 512
    # PDNorm conditioning (PT-v2m3, point_transformer_v2m3_pdnorm.py:230)
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False,
                 condition_index=None, context=None):
        deterministic = not train
        cond = (condition_index, context)
        num_stages = len(self.enc_depths)
        state = PointsState(coord=point.coord, mask=point.mask)
        n0 = point.num_points

        feat = nn.Dense(self.patch_embed_channels, use_bias=False,
                        dtype=self.dtype, name="patch_embed_proj")(
            point.feat.astype(self.dtype))
        feat = nn.relu(PointBN(
            self.patch_embed_channels, self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
            name="patch_embed_norm",
        )(feat, state.mask, deterministic, cond=cond))
        feat = BlockSequence(
            depth=self.patch_embed_depth,
            embed_channels=self.patch_embed_channels,
            groups=self.patch_embed_groups,
            neighbours=self.patch_embed_neighbours,
            qkv_bias=self.attn_qkv_bias, pe_multiplier=self.pe_multiplier,
            pe_bias=self.pe_bias, grouped_linear=self.grouped_linear,
            attn_drop_rate=self.attn_drop_rate, knn_tile=self.knn_tile,
            conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
            dtype=self.dtype, name="patch_embed_blocks",
        )(feat, state, deterministic, cond=cond)

        enc_dp = [float(x) for x in
                  _np.linspace(0, self.drop_path_rate, sum(self.enc_depths))]
        dec_dp = [float(x) for x in
                  _np.linspace(0, self.drop_path_rate, sum(self.dec_depths))]
        enc_channels = [self.patch_embed_channels] + list(self.enc_channels)
        dec_channels = list(self.dec_channels) + [enc_channels[-1]]

        skips = []
        for s in range(num_stages):
            cap = max(16, int(math.ceil(n0 * self.stage_capacity[s] / 16)) * 16)
            cap = min(cap, n0)
            x, new_state, plan = GridPool(
                in_channels=enc_channels[s], out_channels=enc_channels[s + 1],
                grid_size=self.grid_sizes[s],
                conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype,
                name=f"enc{s}_down",
            )(feat, state, cap, deterministic, cond=cond)
            skips.append((feat, state, plan))
            feat, state = x, new_state
            feat = BlockSequence(
                depth=self.enc_depths[s], embed_channels=enc_channels[s + 1],
                groups=self.enc_groups[s], neighbours=self.enc_neighbours[s],
                qkv_bias=self.attn_qkv_bias, pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias, grouped_linear=self.grouped_linear,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=tuple(
                    enc_dp[sum(self.enc_depths[:s]):sum(self.enc_depths[:s + 1])]
                ),
                knn_tile=self.knn_tile,
                conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype, name=f"enc{s}_blocks",
            )(feat, state, deterministic, cond=cond)

        for s in reversed(range(num_stages)):
            skip_feat, skip_state, plan = skips.pop()
            feat = UnpoolWithSkip(
                in_channels=dec_channels[s + 1], skip_channels=enc_channels[s],
                out_channels=dec_channels[s], backend=self.unpool_backend,
                conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype, name=f"dec{s}_up",
            )(feat, state, skip_feat, skip_state, plan, deterministic,
              cond=cond)
            state = skip_state
            feat = BlockSequence(
                depth=self.dec_depths[s], embed_channels=dec_channels[s],
                groups=self.dec_groups[s], neighbours=self.dec_neighbours[s],
                qkv_bias=self.attn_qkv_bias, pe_multiplier=self.pe_multiplier,
                pe_bias=self.pe_bias, grouped_linear=self.grouped_linear,
                attn_drop_rate=self.attn_drop_rate,
                drop_path_rates=tuple(
                    dec_dp[sum(self.dec_depths[:s]):sum(self.dec_depths[:s + 1])]
                ),
                knn_tile=self.knn_tile,
                conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype, name=f"dec{s}_blocks",
            )(feat, state, deterministic, cond=cond)

        if self.num_classes > 0:
            x = nn.Dense(dec_channels[0], dtype=self.dtype, name="seg_head_fc1")(feat)
            x = nn.relu(PointBN(
                dec_channels[0], self.dtype, conditions=self.conditions, pd_decouple=self.pd_decouple,
                pd_adaptive=self.pd_adaptive,
                context_channels=self.context_channels,
                name="seg_head_norm",
            )(x, state.mask, deterministic, cond=cond))
            feat = nn.Dense(self.num_classes, dtype=self.dtype,
                            name="seg_head_fc2")(x)
        return point.replace(feat=feat, coord=state.coord, mask=state.mask)


@MODELS.register_module("PT-v2m1")
class PointTransformerV2M1(PointTransformerV2):
    """PT-v2m1 (point_transformer_v2m1_origin.py): grouped-linear weight
    encoding enabled."""

    grouped_linear: bool = True


@MODELS.register_module("PT-v2m3")
class PointTransformerV2M3(PointTransformerV2):
    """PT-v2m3 (point_transformer_v2m3_pdnorm.py:230): prompt-driven
    normalization for Point Prompt Training."""

    conditions: Optional[Tuple[str, ...]] = ("ScanNet", "S3DIS", "Structured3D")
    pd_adaptive: bool = True
