"""OctFormer, TPU-native.

Re-design of the reference OctFormer
(pointcept/models/octformer/octformer_v1m1_base.py:34-630). The octree's
shuffled-key order IS the z-order curve, so the whole model lowers onto the
serialization machinery:

  - octree leaves at depth D = grid coords at voxel size
    octree_scale_factor / 2^D; octree levels = pooling plans (code >> 3).
  - OctreeAttention (l.196-268): window attention over the z-sorted
    sequence; dilation d regroups a K*d block into d stride-d windows —
    pure reshapes of the sorted tensor, no gathers (reference
    data.view(-1, K, D).transpose(1, 2), l.233-236).
  - RPE (l.163-193): per-axis relative-coordinate tables summed into the
    attention logits.
  - OctreeDWConvBn CPE -> depthwise submanifold conv
    (ops/subm_conv.subm_dwconv_apply).
  - decoder FPN (l.380-428): per-stage 1x1 + nearest unpooling through the
    recorded pooling plans, head-up inverse convs back to full resolution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as _np

from scenesplat_tpu.ops.segops import (
    build_pooling_plan,
    pool_serialization,
    pool_values,
    unpool_values,
)
from scenesplat_tpu.ops.serialization import serialize, take_along_points
from scenesplat_tpu.ops.subm_conv import (
    build_subm_conv_plan,
    subm_dwconv_apply,
)
from .builder import MODELS
from .norm import LayerNorm, MaskedBatchNorm

# BatchNorm conventions in the reference split by call site: raw
# torch.nn.BatchNorm1d (cpe OctreeDWConvBn l.155, stage Downsample l.491,
# seg_head l.571) keeps torch defaults eps=1e-5/momentum=0.1, while
# ocnn.modules.OctreeConvBnRelu/OctreeDeconvBnRelu (stem, fpn 3x3 convs,
# head-up deconvs) use ocnn's bn_momentum=0.01 (eps 1e-5).
import functools as _functools

_BN = _functools.partial(MaskedBatchNorm, eps=1e-5, momentum=0.1)
_BN01 = _functools.partial(MaskedBatchNorm, eps=1e-5, momentum=0.01)
from scenesplat_tpu.ops.sparse_conv import (
    build_corner_lookup,
    deconv_k3s2_apply,
)
from .ptv3 import SubMConv
from .spunet import LevelState, StridedConv, _round_cap
from .structure import PointBatch


class DeconvK3(nn.Module):
    """ocnn OctreeDeconv(kernel=[3], stride=2): coarse parents -> fine
    children via the corner-anchored 27-tap transposed stencil
    (ops.sparse_conv.deconv_k3s2_apply; reference decoder head,
    octformer_v1m1_base.py:402-426)."""

    in_channels: int
    out_channels: int
    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_parent, parent_level: LevelState,
                 child_level: LevelState):
        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02),
            (27, self.in_channels, self.out_channels), jnp.float32,
        )
        idx, found = build_corner_lookup(
            (parent_level.ser.code_hi[0], parent_level.ser.code_lo[0],
             parent_level.ser.order[0]),
            child_level.grid_coord, child_level.mask, depth=self.depth,
            packed=self.depth <= 10,
        )
        return deconv_k3s2_apply(
            feat_parent, idx, found, child_level.grid_coord,
            kernel.astype(self.dtype), mask=child_level.mask,
        )


class OctreeAttention(nn.Module):
    """Windowed attention with optional dilation + RPE (reference l.196-268)."""

    dim: int
    patch_size: int
    num_heads: int
    dilation: int = 1
    qkv_bias: bool = True
    use_rpe: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: LevelState, deterministic: bool):
        c, h, k, d = self.dim, self.num_heads, self.patch_size, self.dilation
        b, n = level.mask.shape
        hd = c // h
        scale = hd**-0.5
        order = level.ser.order[0]
        inverse = level.ser.inverse[0]

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(feat)
        block = k * d
        l_pad = -(-n // block) * block
        pad = l_pad - n

        def sort_pad(x, fill=0):
            s = take_along_points(x, order)
            if pad:
                s = jnp.pad(s, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2),
                            constant_values=fill)
            return s

        qkv_s = sort_pad(qkv)
        valid_s = sort_pad(level.mask.astype(jnp.int32)).astype(bool)
        coord_s = sort_pad(level.grid_coord)

        def dilate(x):
            # [B, L, ...] -> group K*d blocks into d stride-d windows
            rest = x.shape[2:]
            x = x.reshape((b, l_pad // block, k, d) + rest)
            x = jnp.swapaxes(x, 2, 3)
            return x.reshape((b, l_pad // k, k) + rest)

        qkv_w = dilate(qkv_s).reshape(b, -1, k, 3, h, hd)
        valid_w = dilate(valid_s)
        coord_w = dilate(coord_s)

        q = qkv_w[..., 0, :, :].transpose(0, 1, 3, 2, 4) * scale  # [B,W,H,K,hd]
        kk = qkv_w[..., 1, :, :].transpose(0, 1, 3, 2, 4)
        v = qkv_w[..., 2, :, :].transpose(0, 1, 3, 2, 4)
        attn = jnp.einsum("bwhid,bwhjd->bwhij", q, kk).astype(jnp.float32)

        if self.use_rpe:
            pos_bnd = int(0.8 * k * d**0.5)
            rpe_num = 2 * pos_bnd + 1
            table = self.param("rpe_table",
                               nn.initializers.truncated_normal(0.02),
                               (3 * rpe_num, h), jnp.float32)
            rel = coord_w[:, :, :, None, :] - coord_w[:, :, None, :, :]
            rel = jnp.clip(rel, -pos_bnd, pos_bnd) + pos_bnd  # [B,W,K,K,3]
            bias = 0.0
            for axis in range(3):
                bias = bias + jnp.take(
                    table[axis * rpe_num:(axis + 1) * rpe_num],
                    rel[..., axis], axis=0,
                )
            attn = attn + bias.transpose(0, 1, 4, 2, 3)  # [B,W,H,K,K]

        neg = jnp.asarray(-1e3, jnp.float32)  # reference invalid_mask_value
        attn = jnp.where(valid_w[:, :, None, None, :], attn, neg)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bwhij,bwhjd->bwhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, l_pad // k, k, c)

        def undilate(x):
            rest = x.shape[3:]
            x = x.reshape((b, l_pad // block, d, k) + rest)
            x = jnp.swapaxes(x, 2, 3)
            return x.reshape((b, l_pad) + rest)

        out = undilate(out)[:, :n]
        out = take_along_points(out, inverse)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return out


class OctFormerBlock(nn.Module):
    """CPE + attention + MLP (reference l.275-316)."""

    dim: int
    num_heads: int
    patch_size: int
    dilation: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, level: LevelState, deterministic: bool):
        c = self.dim
        dw_weight = self.param("cpe_weight",
                               nn.initializers.truncated_normal(0.02),
                               (27, c), jnp.float32)
        x = subm_dwconv_apply(feat, level.conv_plan, dw_weight.astype(feat.dtype))
        x = _BN(c, dtype=self.dtype, name="cpe_norm")(
            x, level.mask, use_running_average=deterministic)
        feat = feat + x

        # ocnn.nn.OctreeDropPath drops whole residual branches per SCENE
        # (batch element), not per point — broadcast over points and channels
        droppath = nn.Dropout(self.drop_path, broadcast_dims=(1, 2),
                              deterministic=deterministic, name="drop_path")
        attn = OctreeAttention(
            dim=c, patch_size=self.patch_size, num_heads=self.num_heads,
            dilation=self.dilation, dtype=self.dtype, name="attention",
        )(LayerNorm(c, dtype=self.dtype, name="norm1")(feat), level,
          deterministic)
        feat = feat + droppath(attn)
        y = LayerNorm(c, dtype=self.dtype, name="norm2")(feat)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return feat + droppath(y)


@MODELS.register_module("OctFormer-v1m1")
class OctFormer(nn.Module):
    """Reference OctFormer (octformer_v1m1_base.py:507-630)."""

    in_channels: int
    num_classes: int
    fpn_channels: int = 168
    channels: Tuple[int, ...] = (96, 192, 384, 384)
    num_blocks: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 24)
    patch_size: int = 26
    stem_down: int = 2
    head_up: int = 2
    dilation: int = 4
    drop_path: float = 0.5
    octree_scale_factor: float = 10.24
    octree_depth: int = 11
    # accepted for reference-config parity; only affects ocnn's dense-level
    # bookkeeping, never the nempty compute path (octformer_v1m1_base.py:525)
    octree_full_depth: int = 2
    serialization_depth: int = 12
    # "ocnn" (default, reference-exact): ocnn octree quantization — points
    # in [-scale, scale], leaf cell floor((coord/scale + 1) * 2^(D-1)) —
    # with duplicate-leaf points mean-pooled into octants and
    # nearest-interpolated back at the head (ocnn Octree.build_octree /
    # OctreeInterp; octformer_v1m1_base.py:579-627). "cmin": scene-min
    # anchored voxels at scale/2^depth, no leaf dedup — a faster variant
    # for pre-deduplicated GridSample inputs and UNBOUNDED scenes (no
    # [-scale, scale] assumption), not value-compatible with reference
    # checkpoints
    quantization: str = "ocnn"
    stage_capacity: Optional[Tuple[float, ...]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        depth = self.serialization_depth
        n0 = point.num_points
        num_stages = len(self.channels)
        n_pools = self.stem_down + num_stages - 1
        caps = self.stage_capacity or tuple(
            0.7 * 0.5**s for s in range(n_pools)
        )

        def make_level(grid_coord, mask, ser):
            return LevelState(
                grid_coord=grid_coord, mask=mask, ser=ser,
                conv_plan=build_subm_conv_plan(
                    grid_coord, mask, kernel_size=3, depth=depth,
                    z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
                ),
            )

        feat = point.feat.astype(self.dtype)
        leaf_plan = None
        if self.quantization == "ocnn":
            # ocnn octree leaves: cell = floor((coord/scale + 1) * 2^(D-1))
            half = float(1 << (self.octree_depth - 1))
            gc = jnp.floor(
                (point.coord / self.octree_scale_factor + 1.0) * half
            ).astype(jnp.int32)
            gc = jnp.clip(gc, 0, (1 << self.octree_depth) - 1)
            gc = jnp.where(point.mask[..., None], gc, 0)
            ser0 = serialize(gc, point.mask, ("z",), depth)
            # duplicate-leaf points mean-pool into one octant
            # (Octree.build_octree feature averaging)
            leaf_plan = build_pooling_plan(
                ser0, point.mask, out_capacity=gc.shape[1], pooling_depth=0
            )
            feat = pool_values(leaf_plan, feat, reduce="mean")
            gc = take_along_points(gc, leaf_plan.head_index)
            gc = jnp.where(leaf_plan.out_mask[..., None], gc, 0)
            ser0 = pool_serialization(leaf_plan, ser0, 0, packed=depth <= 10)
            level = make_level(gc, leaf_plan.out_mask, ser0)
        else:
            # scene-min anchored leaves at scale_factor / 2^octree_depth
            voxel = self.octree_scale_factor / (1 << self.octree_depth)
            big = jnp.asarray(1e10, point.coord.dtype)
            masked = jnp.where(point.mask[..., None], point.coord, big)
            cmin = jnp.min(masked, axis=1, keepdims=True)
            gc = jnp.floor((point.coord - cmin) / voxel).astype(jnp.int32)
            gc = jnp.where(point.mask[..., None], jnp.maximum(gc, 0), 0)
            gc = jnp.minimum(gc, (1 << depth) - 1)
            level = make_level(
                gc, point.mask, serialize(gc, point.mask, ("z",), depth)
            )

        def conv_bn_relu(x, cin, cout, lvl, name):
            # ocnn.modules.OctreeConvBnRelu: k3s1 conv (no bias) + BN(0.01)
            x = SubMConv(cin, cout, kernel_size=3, use_bias=False,
                         dtype=self.dtype, name=f"{name}_conv")(x, lvl.conv_plan)
            x = _BN01(cout, dtype=self.dtype, name=f"{name}_norm")(
                x, lvl.mask, use_running_average=deterministic)
            return nn.relu(x)

        def downsample(x, cin, cout, lvl, cap, name, relu=True,
                       use_bias=False):
            # relu=True: ocnn OctreeConvBnRelu([2], s2) — no bias, BN(0.01).
            # relu=False: the reference's Downsample module — k2s2 conv with
            # bias, raw torch BN (momentum 0.1), no relu (l.482-504).
            plan = build_pooling_plan(lvl.ser, lvl.mask, cap, pooling_depth=1)
            y = StridedConv(cin, cout, use_bias=use_bias, dtype=self.dtype,
                            name=f"{name}_conv")(x, plan, lvl.grid_coord)
            new_grid = take_along_points(lvl.grid_coord, plan.head_index) >> 1
            new_ser = pool_serialization(plan, lvl.ser, 1, packed=depth <= 10)
            new_lvl = make_level(new_grid, plan.out_mask, new_ser)
            bn = _BN01 if relu else _BN
            y = bn(cout, dtype=self.dtype, name=f"{name}_norm")(
                y, new_lvl.mask, use_running_average=deterministic)
            if relu:
                y = nn.relu(y)
            return y, new_lvl, plan

        # patch embed (reference l.430-480)
        stem_ch = [int(self.channels[0] * 2**i)
                   for i in range(-self.stem_down, 1)]
        stem_records = []  # (plan, child level) for the head-up deconvs
        pool_i = 0
        cin = self.in_channels
        for i in range(self.stem_down):
            feat = conv_bn_relu(feat, cin, stem_ch[i], level, f"embed{i}")
            cap = _round_cap(n0, caps[pool_i])
            child_level = level
            feat, level, plan = downsample(
                feat, stem_ch[i], stem_ch[i + 1], level, cap, f"embed{i}_down")
            stem_records.append((plan, child_level))
            pool_i += 1
            cin = stem_ch[i + 1]
        feat = conv_bn_relu(feat, cin, self.channels[0], level, "embed_proj")

        dp = [float(x) for x in
              _np.linspace(0, self.drop_path, sum(self.num_blocks))]
        stage_feats = []
        stage_levels = []
        stage_plans = []  # plan that downsampled INTO stage i (i>0)
        for s in range(num_stages):
            for i in range(self.num_blocks[s]):
                feat = OctFormerBlock(
                    dim=self.channels[s], num_heads=self.num_heads[s],
                    patch_size=self.patch_size,
                    dilation=1 if i % 2 == 0 else self.dilation,
                    drop_path=dp[sum(self.num_blocks[:s]) + i],
                    dtype=self.dtype, name=f"stage{s}_block{i}",
                )(feat, level, deterministic)
            stage_feats.append(feat)
            stage_levels.append(level)
            if s < num_stages - 1:
                cap = _round_cap(n0, caps[pool_i])
                feat, level, plan = downsample(
                    feat, self.channels[s], self.channels[s + 1], level, cap,
                    f"down{s}", relu=False, use_bias=True)
                stage_plans.append(plan)
                pool_i += 1

        # FPN decoder (reference l.380-428): deepest stage -> finest stage
        fpn = self.fpn_channels
        feature = nn.Dense(fpn, dtype=self.dtype, name="fpn_fc0")(
            stage_feats[-1])
        conv_out = conv_bn_relu(feature, fpn, fpn, stage_levels[-1], "fpn_conv0")
        # upsample everything to the finest stage (stage 0) resolution
        def up_to_stage0(x, from_stage):
            for t in reversed(range(from_stage)):
                x = unpool_values(x, stage_plans[t].cluster_of_point)
            return x

        out = up_to_stage0(conv_out, num_stages - 1)
        for i in range(1, num_stages):
            s = num_stages - 1 - i
            feature = unpool_values(feature, stage_plans[s].cluster_of_point)
            feature = nn.Dense(fpn, dtype=self.dtype, name=f"fpn_fc{i}")(
                stage_feats[s]) + feature
            conv_out = conv_bn_relu(feature, fpn, fpn, stage_levels[s],
                                    f"fpn_conv{i}")
            out = out + up_to_stage0(conv_out, s)

        # head-up OctreeDeconvBnRelu(k3, s2) back through the stem pools
        # (reference decoder up_conv, l.402-426)
        parent_level = stage_levels[0]
        for i in range(min(self.head_up, self.stem_down)):
            plan, child_level = stem_records[self.stem_down - 1 - i]
            out = DeconvK3(fpn, fpn, depth=depth, dtype=self.dtype,
                           name=f"up_conv{i}")(out, parent_level, child_level)
            out = nn.relu(_BN01(fpn, dtype=self.dtype,
                                name=f"up_conv{i}_norm")(
                out, child_level.mask, use_running_average=deterministic))
            parent_level = child_level
        # any remaining stem levels: nearest unpooling (reference OctreeInterp
        # 'nearest' back to the input points, l.626-628)
        for j in range(min(self.head_up, self.stem_down), self.stem_down):
            plan, _ = stem_records[self.stem_down - 1 - j]
            out = unpool_values(out, plan.cluster_of_point)
        if leaf_plan is not None:
            # OctreeInterp('nearest'): each input point takes its leaf
            # octant's value (l.626-628)
            out = unpool_values(out, leaf_plan.cluster_of_point)

        if self.num_classes > 0:
            x = nn.Dense(fpn, dtype=self.dtype, name="seg_fc1")(out)
            x = nn.relu(_BN(fpn, dtype=self.dtype, name="seg_norm")(
                x, point.mask, use_running_average=deterministic))
            out = nn.Dense(self.num_classes, dtype=self.dtype, name="seg_fc2")(x)
        return point.replace(feat=out)
