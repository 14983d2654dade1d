"""MinkUNet family, TPU-native.

Re-design of the reference MinkowskiEngine UNets
(pointcept/models/sparse_unet/mink_unet.py:159-440). Minkowski stride-1
kernel-3 convolutions keep the input coordinate map, so they lower to the
same sorted-code submanifold plans as spconv (ops/subm_conv.py); the
kernel-2/stride-2 down/transpose convolutions lower to parent-cluster tap
matmuls (ops/sparse_conv.py). ResNet blocks: BasicBlock (expansion 1) and
Bottleneck (expansion 4, mink_unet.py:94-156).

All 15 reference variants are registered (MinkUNet14/18/34/50/101 and the
A/B/C/D plane variants, mink_unet.py:365-440).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from scenesplat_tpu.ops.segops import build_pooling_plan, pool_serialization
from scenesplat_tpu.ops.serialization import serialize, take_along_points
from scenesplat_tpu.ops.subm_conv import build_subm_conv_plan, subplan
from .builder import MODELS
from .norm import MaskedBatchNorm
from .ptv3 import SubMConv
from .spunet import InverseConv, LevelState, StridedConv, _round_cap
from .structure import PointBatch


class MinkBasicBlock(nn.Module):
    """Reference BasicBlock (mink_unet.py:38-91)."""

    inplanes: int
    planes: int
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: LevelState, deterministic: bool):
        p = self.planes
        residual = feat
        x = SubMConv(self.inplanes, p, kernel_size=3, use_bias=False,
                     dtype=self.dtype, name="conv1")(feat, level.conv_plan)
        x = nn.relu(MaskedBatchNorm(p, eps=1e-5, momentum=self.bn_momentum,
                                    dtype=self.dtype, name="norm1")(
            x, level.mask, use_running_average=deterministic))
        x = SubMConv(p, p, kernel_size=3, use_bias=False,
                     dtype=self.dtype, name="conv2")(x, level.conv_plan)
        x = MaskedBatchNorm(p, eps=1e-5, momentum=self.bn_momentum, dtype=self.dtype,
                            name="norm2")(x, level.mask,
                                          use_running_average=deterministic)
        if self.inplanes != p:
            residual = nn.Dense(p, use_bias=False, dtype=self.dtype,
                                name="downsample")(residual)
            residual = MaskedBatchNorm(
                p, eps=1e-5, momentum=self.bn_momentum, dtype=self.dtype,
                name="downsample_norm",
            )(residual, level.mask, use_running_average=deterministic)
        return nn.relu(x + residual)


class MinkBottleneck(nn.Module):
    """Reference Bottleneck, expansion 4 (mink_unet.py:94-156)."""

    inplanes: int
    planes: int
    bn_momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: LevelState, deterministic: bool):
        p, out_c = self.planes, self.planes * 4
        residual = feat

        def bn(c, name):
            return MaskedBatchNorm(c, eps=1e-5, momentum=self.bn_momentum,
                                   dtype=self.dtype, name=name)

        x = nn.Dense(p, use_bias=False, dtype=self.dtype, name="conv1")(feat)
        x = nn.relu(bn(p, "norm1")(x, level.mask, use_running_average=deterministic))
        x = SubMConv(p, p, kernel_size=3, use_bias=False, dtype=self.dtype,
                     name="conv2")(x, level.conv_plan)
        x = nn.relu(bn(p, "norm2")(x, level.mask, use_running_average=deterministic))
        x = nn.Dense(out_c, use_bias=False, dtype=self.dtype, name="conv3")(x)
        x = bn(out_c, "norm3")(x, level.mask, use_running_average=deterministic)
        if self.inplanes != out_c:
            residual = nn.Dense(out_c, use_bias=False, dtype=self.dtype,
                                name="downsample")(residual)
            residual = bn(out_c, "downsample_norm")(
                residual, level.mask, use_running_average=deterministic)
        return nn.relu(x + residual)


class MinkUNetBase(nn.Module):
    """Reference MinkUNetBase (mink_unet.py:159-362): stem k=5, 4 stride-2
    encoder stages, 4 transpose-conv decoder stages with skip concats."""

    in_channels: int
    out_channels: int
    block: str = "basic"  # "basic" | "bottleneck"
    layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    planes: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)
    init_dim: int = 32
    bn_momentum: float = 0.1
    serialization_depth: int = 16
    stage_capacity: Tuple[float, ...] = (0.5, 0.25, 0.125, 0.0625)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        expansion = 4 if self.block == "bottleneck" else 1
        BlockCls = MinkBottleneck if self.block == "bottleneck" else MinkBasicBlock
        n0 = point.num_points

        def bn(c, name):
            return MaskedBatchNorm(c, eps=1e-5, momentum=self.bn_momentum,
                                   dtype=self.dtype, name=name)

        def make_level(grid_coord, mask, ser):
            return LevelState(
                grid_coord=grid_coord, mask=mask, ser=ser,
                conv_plan=build_subm_conv_plan(
                    grid_coord, mask, kernel_size=3,
                    depth=self.serialization_depth,
                    z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
                ),
            )

        def run_blocks(feat, level, inplanes, planes, depth, prefix):
            for i in range(depth):
                feat = BlockCls(
                    inplanes=inplanes if i == 0 else planes * expansion,
                    planes=planes, bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name=f"{prefix}_block{i}",
                )(feat, level, deterministic)
            return feat

        ser = (point.ser if point.ser is not None
               else serialize(point.grid_coord, point.mask, orders=("z",),
                              depth=self.serialization_depth))
        stem_plan = build_subm_conv_plan(
            point.grid_coord, point.mask, kernel_size=5,
            depth=self.serialization_depth,
            z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
        )
        level = LevelState(point.grid_coord, point.mask, ser, subplan(stem_plan, 3))

        x = SubMConv(self.in_channels, self.init_dim, kernel_size=5,
                     use_bias=False, dtype=self.dtype, name="conv0")(
            point.feat.astype(self.dtype), stem_plan)
        out_p1 = nn.relu(bn(self.init_dim, "bn0")(
            x, level.mask, use_running_average=deterministic))

        # encoder
        inplanes = self.init_dim
        skips = [(out_p1, level, None, inplanes)]
        feat = out_p1
        for s in range(4):
            cap = _round_cap(n0, self.stage_capacity[s])
            plan = build_pooling_plan(level.ser, level.mask, cap, pooling_depth=1)
            x = StridedConv(inplanes, inplanes, dtype=self.dtype,
                            name=f"conv{s + 1}_down")(feat, plan, level.grid_coord)
            new_grid = take_along_points(level.grid_coord, plan.head_index) >> 1
            new_ser = pool_serialization(plan, level.ser, pooling_depth=1,
                                         packed=self.serialization_depth <= 10)
            skips[-1] = (skips[-1][0], skips[-1][1], plan, skips[-1][3])
            level = make_level(new_grid, plan.out_mask, new_ser)
            x = nn.relu(bn(inplanes, f"bn{s + 1}")(
                x, level.mask, use_running_average=deterministic))
            feat = run_blocks(x, level, inplanes, self.planes[s],
                              self.layers[s], f"enc{s + 1}")
            inplanes = self.planes[s] * expansion
            skips.append((feat, level, None, inplanes))

        skips.pop()  # deepest stage is the current feat
        # decoder
        for d in range(4):
            skip_feat, skip_level, plan, skip_ch = skips.pop()
            p_out = self.planes[4 + d]
            x = InverseConv(inplanes, p_out, dtype=self.dtype,
                            name=f"convtr{4 + d}")(
                feat, plan, skip_level.grid_coord, skip_level.mask)
            x = nn.relu(bn(p_out, f"bntr{4 + d}")(
                x, skip_level.mask, use_running_average=deterministic))
            level = skip_level
            feat = jnp.concatenate([x, skip_feat], axis=-1)
            inplanes = p_out + skip_ch
            feat = run_blocks(feat, level, inplanes, p_out,
                              self.layers[4 + d], f"dec{4 + d}")
            inplanes = p_out * expansion

        feat = nn.Dense(self.out_channels, use_bias=True, dtype=self.dtype,
                        name="final")(feat)
        return point.replace(feat=feat, grid_coord=level.grid_coord,
                             mask=level.mask, ser=level.ser)


_VARIANTS = {
    # name: (block, layers, planes) — mink_unet.py:365-440
    "MinkUNet14": ("basic", (1,) * 8, None),
    "MinkUNet18": ("basic", (2,) * 8, None),
    "MinkUNet34": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), None),
    "MinkUNet50": ("bottleneck", (2, 3, 4, 6, 2, 2, 2, 2), None),
    "MinkUNet101": ("bottleneck", (2, 3, 4, 23, 2, 2, 2, 2), None),
    "MinkUNet14A": ("basic", (1,) * 8, (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet14B": ("basic", (1,) * 8, (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet14C": ("basic", (1,) * 8, (32, 64, 128, 256, 192, 192, 128, 128)),
    "MinkUNet14D": ("basic", (1,) * 8, (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet18A": ("basic", (2,) * 8, (32, 64, 128, 256, 128, 128, 96, 96)),
    "MinkUNet18B": ("basic", (2,) * 8, (32, 64, 128, 256, 128, 128, 128, 128)),
    "MinkUNet18D": ("basic", (2,) * 8, (32, 64, 128, 256, 384, 384, 384, 384)),
    "MinkUNet34A": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
    "MinkUNet34B": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 64, 32)),
    "MinkUNet34C": ("basic", (2, 3, 4, 6, 2, 2, 2, 2), (32, 64, 128, 256, 256, 128, 96, 96)),
}

for _name, (_block, _layers, _planes) in _VARIANTS.items():
    # re-declare fields with annotations so the flax dataclass transform
    # picks up the new defaults (plain class attrs keep base defaults)
    _fields = {"block": _block, "layers": _layers}
    _ann = {"block": str, "layers": Tuple[int, ...]}
    if _planes is not None:
        _fields["planes"] = _planes
        _ann["planes"] = Tuple[int, ...]
    _cls = type(
        _name,
        (MinkUNetBase,),
        {"__annotations__": _ann, **_fields, "__doc__": f"Reference {_name}."},
    )
    MODELS.register_module(_name)(_cls)
