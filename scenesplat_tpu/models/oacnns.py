"""OA-CNNs (omni-adaptive sparse CNNs), TPU-native.

Re-design of the reference OACNNs
(pointcept/models/oacnns/oacnns_v1m1_base.py:12-345):

  - the multi-scale voxel_grid clusters per stage (l.157-166) become
    fixed-capacity PoolingPlans over quantized grid coords
    (ops/pointops.grid_cluster_plan).
  - the adaptive aggregation (l.88-110) — per-scale in-cluster softmax
    weights, cluster-sum, scale-softmax mixing — is masked segment math.
  - spconv Subм/strided/inverse convolutions reuse ops/subm_conv +
    ops/sparse_conv exactly like SpUNet.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops import pointops as po
from scenesplat_tpu.ops.segops import (
    build_pooling_plan,
    pool_serialization,
    pool_values,
    unpool_values,
)
from scenesplat_tpu.ops.serialization import serialize, take_along_points
from scenesplat_tpu.ops.subm_conv import build_subm_conv_plan
from .builder import MODELS
from .norm import MaskedBatchNorm
from .ptv3 import SubMConv
from .spunet import InverseConv, LevelState, StridedConv, _round_cap
from .structure import PointBatch


class _LinBNReLU(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = False  # BasicBlock projections: bias=False (l.32-54);
    # UpBlock fuse Linears keep torch's default bias=True (l.196-203)

    @nn.compact
    def __call__(self, x, mask, deterministic):
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc")(x)
        x = MaskedBatchNorm(self.features, dtype=self.dtype, name="norm")(
            x, mask, use_running_average=deterministic)
        return nn.relu(x)


class OABasicBlock(nn.Module):
    """Adaptive multi-scale aggregation + two subm convs (reference l.12-110)."""

    embed_channels: int
    num_scales: int  # len(point_grid_size)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: LevelState, plans, deterministic):
        c = self.embed_channels
        mask = level.mask
        w_pt = mask.astype(jnp.float32)[..., None]
        feats = []
        for i, plan in enumerate(plans):
            m = plan.head_index.shape[-1]
            pw = _LinBNReLU(c, self.dtype, name=f"l_w{i}")(feat, mask, deterministic)
            # subtract in-cluster mean
            mean = pool_values(plan, pw, "mean")
            pw = pw - unpool_values(mean, plan.cluster_of_point)
            pw = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"weight{i}")(pw)
            pwf = pw.astype(jnp.float32)
            pwf = jnp.exp(pwf - jax.lax.stop_gradient(pwf.max())) * w_pt
            denom = unpool_values(pool_values(plan, pwf, "sum"),
                                  plan.cluster_of_point) + 1e-6
            pwf = pwf / denom
            pfeat = _LinBNReLU(c, self.dtype, name=f"proj{i}")(
                feat, mask, deterministic) * pwf.astype(self.dtype)
            pfeat = unpool_values(pool_values(plan, pfeat, "sum"),
                                  plan.cluster_of_point)
            feats.append(pfeat)
        adp = nn.Dense(self.num_scales, use_bias=False, dtype=self.dtype,
                       name="adaptive")(feat)
        adp = jax.nn.softmax(adp.astype(jnp.float32), axis=-1).astype(self.dtype)
        stacked = jnp.stack(feats, axis=2)  # [B, N, S, C]
        mixed = jnp.einsum("bns,bnsc->bnc", adp, stacked)
        x = _LinBNReLU(c, self.dtype, name="proj_last")(feat, mask, deterministic)
        x = jnp.concatenate([x, mixed], axis=-1)
        x = _LinBNReLU(c, self.dtype, name="fuse")(x, mask, deterministic) + feat
        res = x
        x = SubMConv(c, c, kernel_size=3, use_bias=False, trunc_normal_std=0.02,
                     dtype=self.dtype, name="vconv1")(x, level.conv_plan)
        x = nn.relu(MaskedBatchNorm(c, dtype=self.dtype, name="vnorm1")(
            x, mask, use_running_average=deterministic))
        x = SubMConv(c, c, kernel_size=3, use_bias=False, trunc_normal_std=0.02,
                     dtype=self.dtype, name="vconv2")(x, level.conv_plan)
        x = MaskedBatchNorm(c, dtype=self.dtype, name="vnorm2")(
            x, mask, use_running_average=deterministic)
        return nn.relu(x + res)


@MODELS.register_module("OACNNs")
class OACNNs(nn.Module):
    """Reference OACNNs (oacnns_v1m1_base.py:214-345)."""

    in_channels: int
    num_classes: int
    embed_channels: int = 64
    enc_channels: Tuple[int, ...] = (64, 64, 128, 256)
    groups: Tuple[int, ...] = (2, 4, 8, 16)
    enc_depth: Tuple[int, ...] = (2, 3, 6, 4)
    dec_channels: Tuple[int, ...] = (96, 96, 128, 256)
    point_grid_size: Tuple[Tuple[int, ...], ...] = (
        (16, 32, 64), (8, 16, 24), (4, 8, 12), (2, 4, 6))
    dec_depth: Tuple[int, ...] = (2, 2, 2, 2)
    serialization_depth: int = 16
    stage_capacity: Tuple[float, ...] = (0.5, 0.25, 0.125, 0.0625)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        num_stages = len(self.enc_channels)
        n0 = point.num_points

        def make_level(grid_coord, mask, ser):
            return LevelState(
                grid_coord=grid_coord, mask=mask, ser=ser,
                conv_plan=build_subm_conv_plan(
                    grid_coord, mask, kernel_size=3,
                    depth=self.serialization_depth,
                    z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
                ),
            )

        ser = (point.ser if point.ser is not None
               else serialize(point.grid_coord, point.mask, orders=("z",),
                              depth=self.serialization_depth))
        level = make_level(point.grid_coord, point.mask, ser)

        feat = point.feat.astype(self.dtype)
        c0 = self.embed_channels
        for i in range(3):
            feat = SubMConv(
                self.in_channels if i == 0 else c0, c0, kernel_size=3,
                use_bias=False, trunc_normal_std=0.02, dtype=self.dtype,
                name=f"stem{i}",
            )(feat, level.conv_plan)
            feat = nn.relu(MaskedBatchNorm(c0, dtype=self.dtype,
                                           name=f"stem{i}_norm")(
                feat, level.mask, use_running_average=deterministic))

        skips = [(feat, level)]
        enc_in = c0
        down_plans = []
        for s in range(num_stages):
            cap = _round_cap(n0, self.stage_capacity[s])
            plan = build_pooling_plan(level.ser, level.mask, cap, pooling_depth=1)
            down_plans.append(plan)
            x = StridedConv(enc_in, self.enc_channels[s], dtype=self.dtype,
                            name=f"enc{s}_down")(feat, plan, level.grid_coord)
            new_grid = take_along_points(level.grid_coord, plan.head_index) >> 1
            new_ser = pool_serialization(plan, level.ser, pooling_depth=1,
                                         packed=self.serialization_depth <= 10)
            level = make_level(new_grid, plan.out_mask, new_ser)
            feat = nn.relu(MaskedBatchNorm(self.enc_channels[s], dtype=self.dtype,
                                           name=f"enc{s}_down_norm")(
                x, level.mask, use_running_average=deterministic))
            # multi-scale cluster plans over the stage's voxel coords
            n_here = level.mask.shape[-1]
            scale_plans = [
                po.grid_cluster_plan(
                    level.grid_coord.astype(jnp.float32), level.mask,
                    float(g), n_here,
                )
                for g in self.point_grid_size[s]
            ]
            for d in range(self.enc_depth[s]):
                feat = OABasicBlock(
                    embed_channels=self.enc_channels[s],
                    num_scales=len(self.point_grid_size[s]),
                    dtype=self.dtype, name=f"enc{s}_block{d}",
                )(feat, level, scale_plans, deterministic)
            skips.append((feat, level))
            enc_in = self.enc_channels[s]

        feat, level = skips.pop()
        for s in reversed(range(num_stages)):
            skip_feat, skip_level = skips.pop()
            plan = down_plans[s]
            in_ch = (self.enc_channels[-1] if s == num_stages - 1
                     else self.dec_channels[s + 1])
            x = InverseConv(in_ch, self.dec_channels[s], dtype=self.dtype,
                            name=f"dec{s}_up")(
                feat, plan, skip_level.grid_coord, skip_level.mask)
            x = nn.relu(MaskedBatchNorm(self.dec_channels[s], dtype=self.dtype,
                                        name=f"dec{s}_up_norm")(
                x, skip_level.mask, use_running_average=deterministic))
            level = skip_level
            fused = jnp.concatenate([x, skip_feat], axis=-1)
            fused = _LinBNReLU(self.dec_channels[s], self.dtype, use_bias=True,
                               name=f"dec{s}_fuse1")(
                fused, level.mask, deterministic)
            fused = nn.Dense(self.dec_channels[s], dtype=self.dtype,
                             name=f"dec{s}_fuse2_fc")(fused)
            fused = nn.relu(MaskedBatchNorm(self.dec_channels[s],
                                            dtype=self.dtype,
                                            name=f"dec{s}_fuse2_norm")(
                fused, level.mask, use_running_average=deterministic))
            feat = fused + x

        if self.num_classes > 0:
            feat = nn.Dense(self.num_classes, dtype=self.dtype, name="final")(feat)
        return point.replace(feat=feat, grid_coord=level.grid_coord,
                             mask=level.mask, ser=level.ser)
