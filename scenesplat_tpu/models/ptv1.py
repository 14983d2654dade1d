"""Point Transformer V1 (Zhao et al.), TPU-native.

Re-design of the reference PTv1
(pointcept/models/point_transformer/point_transformer_seg.py,
point_transformer_cls.py) on padded fixed-shape batches:

  - pointops.knn_query_and_group -> ops.pointops.knn + grouping.
  - pointops.farthest_point_sampling in TransitionDown -> batched FPS with a
    per-scene sample count n_valid // stride (reference seg.py:95-103).
  - pointops.interpolation in TransitionUp -> IDW 3-NN interpolation.
  - LayerNorm1d (a transposed BatchNorm1d, point_transformer/utils.py:7-14)
    and BatchNorm1d -> MaskedBatchNorm over valid slots.

Registered: PointTransformer-Seg26/38/50 (seg.py:306-330),
PointTransformer-Cls26/38/50 (cls.py:110-133), and
PointTransformer-PartSeg26/38/50 (point_transformer_partseg.py:353-374 —
identical to Seg plus the optional ``num_shape_classes`` shape-category
conditioning of the dec5 head).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops import pointops as po
from scenesplat_tpu.ops.segops import masked_mean_pool
from scenesplat_tpu.ops.serialization import take_along_points
from .builder import MODELS
from .ptv2 import PointBN, PointsState
from .structure import PointBatch


class PointTransformerLayer(nn.Module):
    """Vector self-attention over kNN neighborhoods (reference seg.py:19-78)."""

    in_planes: int
    out_planes: int
    share_planes: int = 8
    nsample: int = 16
    knn_tile: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, deterministic: bool):
        c, s = self.out_planes, self.share_planes
        q = nn.Dense(c, dtype=self.dtype, name="linear_q")(feat)
        k = nn.Dense(c, dtype=self.dtype, name="linear_k")(feat)
        v = nn.Dense(c, dtype=self.dtype, name="linear_v")(feat)
        idx, _ = po.knn(state.coord, state.mask, self.nsample, tile=self.knn_tile)
        kg = po.grouping(idx, k, state.coord, with_xyz=True)
        vg = po.grouping(idx, v, state.coord, with_xyz=False)
        pos, kg = kg[..., :3], kg[..., 3:]
        slot_ok = idx >= 0

        # linear_p: 3 -> 3 -> LN1d -> ReLU -> out
        pr = nn.Dense(3, dtype=self.dtype, name="linear_p_fc1")(pos)
        pr = nn.relu(PointBN(3, self.dtype, name="linear_p_bn")(
            pr, slot_ok, deterministic))
        pr = nn.Dense(c, dtype=self.dtype, name="linear_p_fc2")(pr)

        r_qk = kg - q[:, :, None, :] + pr
        # linear_w: LN1d -> ReLU -> (c -> c/s) -> LN1d -> ReLU -> (c/s -> c/s)
        w = nn.relu(PointBN(c, self.dtype, name="linear_w_bn1")(
            r_qk, slot_ok, deterministic))
        w = nn.Dense(c // s, dtype=self.dtype, name="linear_w_fc1")(w)
        w = nn.relu(PointBN(c // s, self.dtype, name="linear_w_bn2")(
            w, slot_ok, deterministic))
        w = nn.Dense(c // s, dtype=self.dtype, name="linear_w_fc2")(w)
        w = jnp.where(slot_ok[..., None], w.astype(jnp.float32), -1e9)
        w = jax.nn.softmax(w, axis=2).astype(self.dtype)

        # einsum "n t s i, n t i -> n s i" (seg.py:72-77): value groups share
        # one weight lane over the fast axis i = c // share_planes
        val = (vg + pr).reshape(vg.shape[:3] + (s, c // s))
        out = jnp.einsum("bntsi,bnti->bnsi", val, w)
        return out.reshape(vg.shape[:2] + (c,))


class TransitionDown(nn.Module):
    """FPS + kNN grouping + max pool (reference seg.py:81-119)."""

    in_planes: int
    out_planes: int
    stride: int = 1
    nsample: int = 16
    knn_tile: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, deterministic: bool):
        if self.stride == 1:
            x = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype,
                         name="linear")(feat)
            x = nn.relu(PointBN(self.out_planes, self.dtype, name="bn")(
                x, state.mask, deterministic))
            return x, state
        n = state.coord.shape[1]
        m = max(1, n // self.stride)
        idx, _ = po.farthest_point_sampling(state.coord, state.mask, m)
        n_valid = jnp.sum(state.mask, axis=1).astype(jnp.int32)
        n_new = n_valid // self.stride  # reference seg.py:96-101
        new_mask = (
            jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
            < jnp.maximum(n_new, 1)[:, None]
        )
        new_coord = take_along_points(state.coord, idx)
        nidx, _ = po.knn(state.coord, state.mask, self.nsample,
                         query=new_coord, query_mask=new_mask, tile=self.knn_tile)
        g = po.grouping(nidx, feat, state.coord, query_coord=new_coord,
                        with_xyz=True)  # [B, M, K, 3+C]
        x = nn.Dense(self.out_planes, use_bias=False, dtype=self.dtype,
                     name="linear")(g)
        x = nn.relu(PointBN(self.out_planes, self.dtype, name="bn")(
            x, nidx >= 0, deterministic))
        x = jnp.where((nidx >= 0)[..., None], x, -jnp.inf).max(axis=2)
        x = jnp.where(new_mask[..., None], x, 0.0).astype(self.dtype)
        return x, PointsState(coord=new_coord, mask=new_mask)


class TransitionUp(nn.Module):
    """Head variant: concat per-scene context; else interpolate + skip
    (reference seg.py:122-168). With ``num_shape_classes`` the head also
    concatenates a 1024-d embedding of the scene's shape-category one-hot
    (the PartSeg variant, point_transformer_partseg.py:122-182)."""

    in_planes: int
    out_planes: int = 0  # 0 == is_head (out_planes=None in reference)
    num_shape_classes: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, deterministic: bool,
                 sub_feat=None, sub_state: PointsState = None,
                 cls_token=None):
        if self.out_planes == 0:
            ctx = masked_mean_pool(feat, state.mask)  # [B, C]
            ctx = nn.relu(nn.Dense(self.in_planes, dtype=self.dtype,
                                   name="linear2")(ctx))
            parts = [feat, jnp.broadcast_to(ctx[:, None, :], feat.shape)]
            if self.num_shape_classes is not None:
                onehot = jax.nn.one_hot(
                    cls_token.reshape(-1), self.num_shape_classes,
                    dtype=feat.dtype,
                )  # [B, L]
                y = nn.relu(nn.Dense(1024, dtype=self.dtype,
                                     name="linear3")(onehot))
                parts.append(jnp.broadcast_to(
                    y[:, None, :], feat.shape[:2] + (1024,)))
            x = jnp.concatenate(parts, axis=-1)
            x = nn.Dense(self.in_planes, dtype=self.dtype, name="linear1")(x)
            x = nn.relu(PointBN(self.in_planes, self.dtype, name="bn1")(
                x, state.mask, deterministic))
            return x
        x1 = nn.Dense(self.out_planes, dtype=self.dtype, name="linear1")(feat)
        x1 = nn.relu(PointBN(self.out_planes, self.dtype, name="bn1")(
            x1, state.mask, deterministic))
        x2 = nn.Dense(self.out_planes, dtype=self.dtype, name="linear2")(sub_feat)
        x2 = nn.relu(PointBN(self.out_planes, self.dtype, name="bn2")(
            x2, sub_state.mask, deterministic))
        return x1 + po.interpolation(
            sub_state.coord, sub_state.mask, state.coord, state.mask, x2
        )


class Bottleneck(nn.Module):
    """linear -> transformer -> linear with residual (reference seg.py:171-192)."""

    planes: int
    share_planes: int = 8
    nsample: int = 16
    knn_tile: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, deterministic: bool):
        p = self.planes
        identity = feat
        x = nn.Dense(p, use_bias=False, dtype=self.dtype, name="linear1")(feat)
        x = nn.relu(PointBN(p, self.dtype, name="bn1")(x, state.mask, deterministic))
        x = PointTransformerLayer(
            in_planes=p, out_planes=p, share_planes=self.share_planes,
            nsample=self.nsample, knn_tile=self.knn_tile, dtype=self.dtype,
            name="transformer",
        )(x, state, deterministic)
        x = nn.relu(PointBN(p, self.dtype, name="bn2")(x, state.mask, deterministic))
        x = nn.Dense(p, use_bias=False, dtype=self.dtype, name="linear3")(x)
        x = PointBN(p, self.dtype, name="bn3")(x, state.mask, deterministic)
        return nn.relu(identity + x)


_PLANES = (32, 64, 128, 256, 512)
_STRIDE = (1, 4, 4, 4, 4)
_NSAMPLE = (8, 16, 16, 16, 16)


class PointTransformerSeg(nn.Module):
    """Reference PointTransformerSeg (seg.py:195-303): 5 encoder stages with
    FPS stride-4 downsampling, 5 decoder stages, per-point classifier."""

    blocks: Tuple[int, ...] = (1, 1, 1, 1, 1)
    in_channels: int = 6
    num_classes: int = 13
    share_planes: int = 8
    # PartSeg variant: condition the dec5 head on the scene's shape
    # category (point.cls_token), point_transformer_partseg.py:216-344
    num_shape_classes: Optional[int] = None
    knn_tile: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        state = PointsState(coord=point.coord, mask=point.mask)
        feat = point.feat.astype(self.dtype)

        def run_blocks(feat, state, planes, depth, nsample, prefix):
            for i in range(depth):
                feat = Bottleneck(
                    planes=planes, share_planes=self.share_planes,
                    nsample=nsample, knn_tile=self.knn_tile,
                    dtype=self.dtype, name=f"{prefix}_block{i}",
                )(feat, state, deterministic)
            return feat

        stages = []
        for s in range(5):
            feat, state = TransitionDown(
                in_planes=self.in_channels if s == 0 else _PLANES[s - 1],
                out_planes=_PLANES[s], stride=_STRIDE[s], nsample=_NSAMPLE[s],
                knn_tile=self.knn_tile, dtype=self.dtype, name=f"enc{s + 1}_down",
            )(feat, state, deterministic)
            feat = run_blocks(feat, state, _PLANES[s], self.blocks[s],
                              _NSAMPLE[s], f"enc{s + 1}")
            stages.append((feat, state))

        # decoder (reference forward seg.py:290-300)
        feat, state = stages[4]
        feat = TransitionUp(in_planes=_PLANES[4], out_planes=0,
                            num_shape_classes=self.num_shape_classes,
                            dtype=self.dtype, name="dec5_up")(
            feat, state, deterministic, cls_token=point.cls_token)
        feat = run_blocks(feat, state, _PLANES[4], 1, _NSAMPLE[4], "dec5")
        for s in reversed(range(4)):
            up_feat, up_state = stages[s]
            feat = TransitionUp(
                in_planes=_PLANES[s + 1], out_planes=_PLANES[s],
                dtype=self.dtype, name=f"dec{s + 1}_up",
            )(up_feat, up_state, deterministic, sub_feat=feat,
              sub_state=state)
            state = up_state
            feat = run_blocks(feat, state, _PLANES[s], 1, _NSAMPLE[s],
                              f"dec{s + 1}")

        x = nn.Dense(_PLANES[0], dtype=self.dtype, name="cls_fc1")(feat)
        x = nn.relu(PointBN(_PLANES[0], self.dtype, name="cls_bn")(
            x, state.mask, deterministic))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_fc2")(x)
        return point.replace(feat=logits, coord=state.coord, mask=state.mask)


class PointTransformerCls(nn.Module):
    """Reference PointTransformerCls (cls.py:17-107): encoder + global mean
    pool + MLP head. Note the reference builds blocks-1 bottlenecks per stage
    (`for _ in range(1, blocks)`, cls.py:81) — reproduced."""

    blocks: Tuple[int, ...] = (1, 1, 1, 1, 1)
    in_channels: int = 6
    num_classes: int = 40
    share_planes: int = 8
    knn_tile: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        state = PointsState(coord=point.coord, mask=point.mask)
        # reference cls.py:91: feat = coord if in_channels==3 else
        # cat(coord, feat) — in_channels counts the 3 coord channels
        if self.in_channels == 3:
            feat = point.coord.astype(self.dtype)
        else:
            feat = jnp.concatenate(
                [point.coord.astype(self.dtype),
                 point.feat.astype(self.dtype)[..., : self.in_channels - 3]],
                axis=-1,
            )

        for s in range(5):
            feat, state = TransitionDown(
                in_planes=self.in_channels if s == 0 else _PLANES[s - 1],
                out_planes=_PLANES[s], stride=_STRIDE[s],
                nsample=_NSAMPLE[s], knn_tile=self.knn_tile, dtype=self.dtype,
                name=f"enc{s + 1}_down",
            )(feat, state, deterministic)
            for i in range(1, self.blocks[s]):
                feat = Bottleneck(
                    planes=_PLANES[s], share_planes=self.share_planes,
                    nsample=_NSAMPLE[s], knn_tile=self.knn_tile,
                    dtype=self.dtype, name=f"enc{s + 1}_block{i}",
                )(feat, state, deterministic)

        x = masked_mean_pool(feat, state.mask)
        x = nn.Dense(256, dtype=self.dtype, name="cls_fc1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5, name="cls_bn1")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.Dense(128, dtype=self.dtype, name="cls_fc2")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5, name="cls_bn2")(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="cls_fc3")(x)


for _name, _blocks in [("26", (1, 1, 1, 1, 1)), ("38", (1, 2, 2, 2, 2)),
                       ("50", (1, 2, 3, 5, 2))]:
    # fields must be re-annotated for the flax dataclass transform to adopt
    # the new defaults
    MODELS.register_module(f"PointTransformer-Seg{_name}")(
        type(f"PointTransformerSeg{_name}", (PointTransformerSeg,),
             {"__annotations__": {"blocks": Tuple[int, ...]},
              "blocks": _blocks,
              "__doc__": f"Reference Seg{_name} (seg.py:306-330)."})
    )
    MODELS.register_module(f"PointTransformer-Cls{_name}")(
        type(f"PointTransformerCls{_name}", (PointTransformerCls,),
             {"__annotations__": {"blocks": Tuple[int, ...]},
              "blocks": _blocks,
              "__doc__": f"Reference Cls{_name} (cls.py:110-133)."})
    )
    MODELS.register_module(f"PointTransformer-PartSeg{_name}")(
        type(f"PointTransformerPartSeg{_name}", (PointTransformerSeg,),
             {"__annotations__": {"blocks": Tuple[int, ...]},
              "blocks": _blocks,
              "__doc__": (f"Reference PartSeg{_name} "
                          "(point_transformer_partseg.py:353-374); "
                          "set num_shape_classes for category-conditioned "
                          "part segmentation.")})
    )
