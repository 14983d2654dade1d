"""SparseUNet (SpUNet) backbone, TPU-native.

Re-design of the reference spconv-driven SpUNet
(pointcept/models/sparse_unet/spconv_unet_v1m1_base.py) for fixed-shape
padded batches:

  - spconv.SubMConv3d k=5 stem / k=3 blocks -> sorted-z-code merge-join
    neighbor plans + gathered matmuls (ops/subm_conv.py), one plan per
    resolution shared by every block at that level (spconv indice_key).
  - spconv.SparseConv3d(kernel=2, stride=2) / SparseInverseConv3d -> parent
    clustering PoolingPlan + 8 tap matmuls (ops/sparse_conv.py).
  - BatchNorm1d(eps=1e-3, momentum=0.01) -> MaskedBatchNorm.

Registered variants: SpUNet-v1m1 (base), SpUNet-v1m2 (configurable
bn_momentum, spconv_unet_v1m2_bn_momentum.py:108), SpUNetNoSkipBase
(spconv_unet_v1m1_base.py:283 — decoder without skip connections).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from scenesplat_tpu.ops.segops import (
    PoolingPlan,
    build_pooling_plan,
    masked_mean_pool,
    pool_serialization,
    pool_values,
)
from scenesplat_tpu.ops.serialization import Serialization, serialize, take_along_points
from scenesplat_tpu.ops.sparse_conv import inverse_conv_apply, strided_conv_apply
from scenesplat_tpu.ops.subm_conv import SubMConvPlan, build_subm_conv_plan
from .builder import MODELS
from .norm import MaskedBatchNorm, PDNorm
from .ptv3 import SubMConv
from .structure import PointBatch


class LevelState(NamedTuple):
    grid_coord: jnp.ndarray  # [B, N, 3]
    mask: jnp.ndarray  # [B, N]
    ser: Serialization
    conv_plan: SubMConvPlan


class CondBatchNorm(nn.Module):
    """MaskedBatchNorm or (when conditions are set) prompt-driven PDNorm
    (reference SpUNet-v1m3, spconv_unet_v1m3_pdnorm.py:26-77)."""

    features: int
    bn_momentum: float = 0.01
    conditions: Optional[Tuple[str, ...]] = None
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic, condition_index=None, context=None):
        if self.conditions is None:
            return MaskedBatchNorm(
                self.features, momentum=self.bn_momentum, dtype=self.dtype,
                name="norm",
            )(x, mask, use_running_average=deterministic)
        cidx = condition_index if condition_index is not None else jnp.zeros((), jnp.int32)
        return PDNorm(
            features=self.features, conditions=tuple(self.conditions),
            norm_type="bn", decouple=self.decouple, adaptive=self.adaptive,
            context_channels=self.context_channels, dtype=self.dtype,
            name="pdnorm",
        )(x, cidx, mask=mask, context=context,
          use_running_average=deterministic)


class StridedConv(nn.Module):
    """spconv.SparseConv3d(kernel=2, stride=2) parameter holder."""

    in_channels: int
    out_channels: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, plan: PoolingPlan, grid_coord):
        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02),
            (8, self.in_channels, self.out_channels), jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
                if self.use_bias else None)
        return strided_conv_apply(
            feat, plan, grid_coord, kernel.astype(self.dtype), bias=bias,
        )


class InverseConv(nn.Module):
    """spconv.SparseInverseConv3d(kernel=2) parameter holder."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_parent, plan: PoolingPlan, child_grid_coord, child_mask):
        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02),
            (8, self.in_channels, self.out_channels), jnp.float32,
        )
        return inverse_conv_apply(
            feat_parent, plan, child_grid_coord, kernel.astype(self.dtype),
            mask=child_mask,
        )


class BasicBlock(nn.Module):
    """Residual block: two k=3 submanifold convs + BN/ReLU and a projected
    shortcut (reference spconv_unet_v1m1_base.py:23-86). ``conditions`` turns
    every norm into PDNorm (SpUNet-v1m3)."""

    in_channels: int
    embed_channels: int
    bn_momentum: float = 0.01
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: LevelState, deterministic: bool,
                 condition_index=None, context=None):
        c = self.embed_channels

        def bn(x, name):
            return CondBatchNorm(
                c, bn_momentum=self.bn_momentum, conditions=self.conditions,
                decouple=self.pd_decouple, adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype,
                name=name,
            )(x, level.mask, deterministic, condition_index, context)

        residual = feat
        x = SubMConv(self.in_channels, c, kernel_size=3, use_bias=False,
                     trunc_normal_std=0.02, dtype=self.dtype, name="conv1")(
            feat, level.conv_plan)
        x = nn.relu(bn(x, "bn1"))
        x = SubMConv(c, c, kernel_size=3, use_bias=False,
                     trunc_normal_std=0.02, dtype=self.dtype, name="conv2")(
            x, level.conv_plan)
        x = bn(x, "bn2")
        if self.in_channels != c:
            # 1x1 submanifold conv == pointwise linear
            residual = nn.Dense(c, use_bias=False, dtype=self.dtype,
                                name="proj")(residual)
            residual = CondBatchNorm(
                c, bn_momentum=self.bn_momentum, conditions=self.conditions,
                decouple=self.pd_decouple, adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype,
                name="proj_norm",
            )(residual, level.mask, deterministic, condition_index, context)
        return nn.relu(x + residual)


def _round_cap(n: int, frac: float) -> int:
    return min(n, max(16, int(math.ceil(n * frac / 16)) * 16))


@MODELS.register_module("SpUNet-v1m1")
class SpUNet(nn.Module):
    """Reference SpUNet-v1m1 (spconv_unet_v1m1_base.py:88-280)."""

    in_channels: int
    num_classes: int = 0
    base_channels: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Tuple[int, ...] = (2, 3, 4, 6, 2, 2, 2, 2)
    cls_mode: bool = False
    skip: bool = True  # False reproduces SpUNetNoSkipBase (l.283-464)
    bn_momentum: float = 0.01  # configurable knob == SpUNet-v1m2
    serialization_depth: int = 16
    # per-downsample cluster-capacity fractions of input N
    stage_capacity: Optional[Tuple[float, ...]] = None
    # PDNorm conditioning (SpUNet-v1m3, spconv_unet_v1m3_pdnorm.py:230)
    conditions: Optional[Tuple[str, ...]] = None
    pd_decouple: bool = True
    pd_adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False,
                 condition_index=None, context=None):
        deterministic = not train
        assert len(self.layers) % 2 == 0 and len(self.layers) == len(self.channels)
        num_stages = len(self.layers) // 2
        caps = self.stage_capacity or tuple(0.5**s for s in range(1, num_stages + 1))
        n0 = point.num_points

        def bn_apply(x, c, mask, name):
            return CondBatchNorm(
                c, bn_momentum=self.bn_momentum, conditions=self.conditions,
                decouple=self.pd_decouple, adaptive=self.pd_adaptive,
                context_channels=self.context_channels, dtype=self.dtype,
                name=name,
            )(x, mask, deterministic, condition_index, context)

        def make_level(grid_coord, mask, ser, kernel_size=3):
            return LevelState(
                grid_coord=grid_coord, mask=mask, ser=ser,
                conv_plan=build_subm_conv_plan(
                    grid_coord, mask, kernel_size=kernel_size,
                    depth=self.serialization_depth,
                    z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
                ),
            )

        ser = (point.ser if point.ser is not None
               else serialize(point.grid_coord, point.mask, orders=("z",),
                              depth=self.serialization_depth))
        # stem plan is k=5; block plan at level 0 is its k=3 slice
        from scenesplat_tpu.ops.subm_conv import subplan

        stem_plan = build_subm_conv_plan(
            point.grid_coord, point.mask, kernel_size=5,
            depth=self.serialization_depth,
            z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
        )
        level = LevelState(
            grid_coord=point.grid_coord, mask=point.mask, ser=ser,
            conv_plan=subplan(stem_plan, 3),
        )

        feat = SubMConv(self.in_channels, self.base_channels, kernel_size=5,
                        use_bias=False, trunc_normal_std=0.02,
                        dtype=self.dtype, name="conv_input")(
            point.feat.astype(self.dtype), stem_plan)
        feat = nn.relu(bn_apply(feat, self.base_channels, level.mask,
                               "norm_input"))

        enc_channels = self.base_channels
        dec_channels = self.channels[-1]
        dec_specs = []  # decoder (in, skip, out, depth) per stage, built like ref
        skips = []

        for s in range(num_stages):
            cap = _round_cap(n0, caps[s])
            plan = build_pooling_plan(level.ser, level.mask, cap, pooling_depth=1)
            skips.append((feat, level, plan))

            x = StridedConv(enc_channels, self.channels[s], dtype=self.dtype,
                            name=f"down{s}")(feat, plan, level.grid_coord)
            new_grid = (
                take_along_points(level.grid_coord, plan.head_index) >> 1
            )
            new_ser = pool_serialization(plan, level.ser, pooling_depth=1,
                                         packed=self.serialization_depth <= 10)
            level = make_level(new_grid, plan.out_mask, new_ser)
            feat = nn.relu(bn_apply(x, self.channels[s], level.mask,
                                   f"down{s}_norm"))
            for i in range(self.layers[s]):
                feat = BasicBlock(
                    in_channels=self.channels[s], embed_channels=self.channels[s],
                    bn_momentum=self.bn_momentum, conditions=self.conditions,
                    pd_decouple=self.pd_decouple, pd_adaptive=self.pd_adaptive,
                    context_channels=self.context_channels, dtype=self.dtype,
                    name=f"enc{s}_block{i}",
                )(feat, level, deterministic, condition_index, context)

            dec_specs.append(
                (self.channels[len(self.channels) - s - 2], enc_channels,
                 dec_channels, self.layers[len(self.channels) - s - 1])
            )
            enc_channels = self.channels[s]
            dec_channels = self.channels[len(self.channels) - s - 2]

        if not self.cls_mode:
            for s in reversed(range(num_stages)):
                up_in, skip_ch, up_out, depth = dec_specs[s]
                skip_feat, skip_level, plan = skips.pop()
                x = InverseConv(up_in, up_out, dtype=self.dtype,
                                name=f"up{s}")(
                    feat, plan, skip_level.grid_coord, skip_level.mask)
                x = nn.relu(bn_apply(x, up_out, skip_level.mask,
                                     f"up{s}_norm"))
                level = skip_level
                if self.skip:
                    feat = jnp.concatenate([x, skip_feat], axis=-1)
                    in_ch = up_out + skip_ch
                else:
                    feat, in_ch = x, up_out
                for i in range(depth):
                    feat = BasicBlock(
                        in_channels=in_ch if i == 0 else up_out,
                        embed_channels=up_out,
                        bn_momentum=self.bn_momentum, conditions=self.conditions,
                        pd_decouple=self.pd_decouple,
                        pd_adaptive=self.pd_adaptive,
                        context_channels=self.context_channels, dtype=self.dtype,
                        name=f"dec{s}_block{i}",
                    )(feat, level, deterministic, condition_index, context)

        if self.num_classes > 0:
            feat = nn.Dense(self.num_classes, dtype=self.dtype, name="final")(feat)
        if self.cls_mode:
            return masked_mean_pool(feat, level.mask)
        return point.replace(
            feat=feat, grid_coord=level.grid_coord, mask=level.mask, ser=level.ser
        )


@MODELS.register_module("SpUNet-v1m2")
class SpUNetV1M2(SpUNet):
    """SpUNet with the bn_momentum knob exposed (reference
    spconv_unet_v1m2_bn_momentum.py:108); default 0.02 as in its configs."""

    bn_momentum: float = 0.02


@MODELS.register_module("SpUNetNoSkipBase")
class SpUNetNoSkip(SpUNet):
    """Decoder without skip connections (reference
    spconv_unet_v1m1_base.py:283-464); used by MSC-style pretraining."""

    skip: bool = False


@MODELS.register_module("SpUNet-v1m3")
class SpUNetV1M3(SpUNet):
    """Prompt-driven-normalization SpUNet for Point Prompt Training
    (reference spconv_unet_v1m3_pdnorm.py:230-438): every norm is a PDNorm
    selected by the batch's dataset condition, optionally modulated by a
    learned context vector."""

    conditions: Optional[Tuple[str, ...]] = ("ScanNet", "S3DIS", "Structured3D")
    pd_adaptive: bool = True
