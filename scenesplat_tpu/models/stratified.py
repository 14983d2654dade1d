"""Stratified Transformer (ST-v1m2), TPU-native.

Re-design of the reference Stratified Transformer
(pointcept/models/stratified_transformer/stratified_transformer_v1m2_refine.py)
and its pointops2 CUDA attention (libs/pointops2):

  - the reference enumerates ragged (query, key) edge lists per window and
    runs scatter attention kernels (attention_step1_v2/step2, scatter
    softmax). Here every point owns a fixed slot buffer: up to
    ``fine_capacity`` same-fine-window neighbors plus ``coarse_capacity``
    FPS-downsampled points from its coarse (2x) window that lie in *other*
    fine windows — the stratified key set (reference BasicLayer.forward,
    l.345-452). Attention is a masked softmax over slots; shifted blocks
    offset the window grid by half a window (l.368-376).
  - window membership tables come from one multi-key sort per grid (window
    code, subset-last flag, position), no dynamic unique (see
    ``window_members``).
  - relative-position bias (l.159-199 + pointops2 dot_prod_with_idx_v3):
    per-axis quantized lookup tables contracted against q (rel_query),
    k (rel_key), and added to v (rel_value).
  - the KPConv stem (torch_points3d KPConvLayer, l.511-591) is a
    kernel-point convolution over ball-query neighborhoods with linear
    influence; kernel points use a deterministic Fibonacci-sphere
    disposition instead of torch_points3d's pre-optimized file.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as _np

from scenesplat_tpu.ops import pointops as po
from scenesplat_tpu.ops.curves import encode
from scenesplat_tpu.ops.serialization import take_along_points
from .builder import MODELS
from .norm import LayerNorm
from .ptv2 import PointBN, PointsState
from .structure import PointBatch


def window_members(
    coord: jnp.ndarray,
    mask: jnp.ndarray,
    window: float,
    start: jnp.ndarray,
    capacity: int,
    subset: Optional[jnp.ndarray] = None,
):
    """Per-point member tables of the point's window.

    Returns (member_idx [B, N, C] int32, member_valid [B, N, C] bool,
    window_coord [B, N, 3] int32). With ``subset`` given, only subset points
    appear as members (they sort first within each window). Windows larger
    than ``capacity`` truncate (the reference densifies to the max count).
    """
    b, n = mask.shape
    gc = jnp.floor((coord - start) / window).astype(jnp.int32)
    gc = jnp.where(mask[..., None], jnp.maximum(gc, 0), 0)
    hi, lo = encode(gc, order="z", depth=16)
    hi = jnp.where(mask, hi, jnp.uint32(0xFFFFFFFF))
    sub = subset if subset is not None else mask
    not_sub = (~sub).astype(jnp.uint32)
    pos = jax.lax.broadcasted_iota(jnp.uint32, (b, n), 1)
    payload = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    s_hi, s_lo, s_ns, _, s_idx = jax.lax.sort(
        (hi, lo, not_sub, pos, payload), dimension=-1, num_keys=4
    )
    changed = jnp.concatenate(
        [jnp.ones((b, 1), bool),
         (s_hi[:, 1:] != s_hi[:, :-1]) | (s_lo[:, 1:] != s_lo[:, :-1])],
        axis=-1,
    )
    cluster_sorted = jnp.cumsum(changed.astype(jnp.int32), axis=-1) - 1  # [B,N]
    posi = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    # window id per ORIGINAL point
    cluster_of_point = jnp.zeros((b, n), jnp.int32)
    cluster_of_point = jax.vmap(
        lambda c, i, cs: c.at[i].set(cs)
    )(cluster_of_point, s_idx, cluster_sorted)
    # per-cluster start position and subset count (clusters <= N)
    seg = cluster_sorted
    starts = jax.ops.segment_min(
        posi.reshape(-1),
        (seg + jnp.arange(b, dtype=jnp.int32)[:, None] * n).reshape(-1),
        num_segments=b * n,
    ).reshape(b, n)
    sub_sorted = (s_ns == 0)
    sub_counts = jax.ops.segment_sum(
        sub_sorted.astype(jnp.int32).reshape(-1),
        (seg + jnp.arange(b, dtype=jnp.int32)[:, None] * n).reshape(-1),
        num_segments=b * n,
    ).reshape(b, n)
    # member table per cluster [B, N(clusters), capacity]
    t = jnp.arange(capacity, dtype=jnp.int32)
    mem_pos = jnp.clip(starts[..., None] + t, 0, n - 1)  # [B, M, C]
    members = take_along_points(s_idx, mem_pos.reshape(b, -1)).reshape(
        b, n, capacity)
    mem_valid = t[None, None] < jnp.minimum(sub_counts, capacity)[..., None]
    # per-point tables
    midx = take_along_points(members, cluster_of_point)  # [B, N, C]
    mval = take_along_points(mem_valid, cluster_of_point) & mask[..., None]
    return midx, mval, gc


class KPConv(nn.Module):
    """Kernel-point convolution (torch_points3d KPConvLayer semantics):
    neighbors weighted by linear influence to fixed kernel points."""

    in_channels: int
    out_channels: int
    point_influence: float
    num_kernel_points: int = 15
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _kernel_points(k: int) -> _np.ndarray:
        """Deterministic disposition: center + Fibonacci sphere."""
        pts = [[0.0, 0.0, 0.0]]
        m = k - 1
        phi = (1 + 5**0.5) / 2
        for i in range(m):
            z = 1 - 2 * (i + 0.5) / m
            r = (1 - z * z) ** 0.5
            th = 2 * _np.pi * i / phi
            pts.append([r * _np.cos(th), r * _np.sin(th), z])
        return _np.asarray(pts, _np.float32)

    @nn.compact
    def __call__(self, feat, neighbor_idx, coord, query_coord=None):
        kp = jnp.asarray(self._kernel_points(self.num_kernel_points)
                         * self.point_influence)
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.num_kernel_points, self.in_channels, self.out_channels),
            jnp.float32,
        )
        g = po.grouping(neighbor_idx, feat, coord, query_coord=query_coord,
                        with_xyz=True)
        rel, gf = g[..., :3], g[..., 3:]
        ok = (neighbor_idx >= 0)[..., None]
        # influence [B, N, K, P]: linear correlation max(0, 1 - d/sigma)
        d = jnp.linalg.norm(
            rel[..., None, :] - kp[None, None, None], axis=-1)
        infl = jnp.maximum(0.0, 1.0 - d / self.point_influence)
        infl = infl * ok.astype(infl.dtype)
        # sum_k sum_p infl * (x_k @ W_p)
        agg = jnp.einsum("bnkp,bnkc->bnpc", infl.astype(gf.dtype), gf)
        out = jnp.einsum("bnpc,pcd->bnd", agg, weight.astype(gf.dtype))
        return out


class StratifiedAttention(nn.Module):
    """Slot-buffer window attention with RPE (reference WindowAttention,
    l.76-222 + pointops2 kernels)."""

    embed_channels: int
    num_heads: int
    window_size: float
    quant_size: float
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state: PointsState, slot_idx, slot_valid,
                 deterministic: bool):
        c, h = self.embed_channels, self.num_heads
        hd = c // h
        scale = hd**-0.5
        b, n, K = slot_idx.shape
        L = int((2 * self.window_size + 1e-4) // self.quant_size)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(feat)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q = qkv[:, :, 0] * scale  # [B, N, H, hd]
        k = qkv[:, :, 1]
        v = qkv[:, :, 2]

        safe = jnp.maximum(slot_idx, 0).reshape(b, -1)
        kg = take_along_points(k, safe).reshape(b, n, K, h, hd)
        vg = take_along_points(v, safe).reshape(b, n, K, h, hd)
        attn = jnp.einsum("bnhd,bnkhd->bnkh", q, kg).astype(jnp.float32)

        rel = state.coord[:, :, None, :] - take_along_points(
            state.coord, safe).reshape(b, n, K, 3)
        rel = jnp.round(rel * 1e5) / 1e5
        ridx = jnp.floor(
            (rel + 2 * self.window_size - 1e-4) / self.quant_size
        ).astype(jnp.int32)
        ridx = jnp.clip(ridx, 0, 2 * L - 1)  # [B, N, K, 3]

        if self.rel_query:
            tq = self.param("relative_pos_query_table",
                            nn.initializers.truncated_normal(0.02),
                            (2 * L, h, hd, 3), jnp.float32)
            for axis in range(3):
                tbl = jnp.take(tq[..., axis], ridx[..., axis], axis=0)
                attn = attn + jnp.einsum(
                    "bnhd,bnkhd->bnkh", q.astype(jnp.float32),
                    tbl.astype(jnp.float32))
        if self.rel_key:
            tk = self.param("relative_pos_key_table",
                            nn.initializers.truncated_normal(0.02),
                            (2 * L, h, hd, 3), jnp.float32)
            for axis in range(3):
                tbl = jnp.take(tk[..., axis], ridx[..., axis], axis=0)
                attn = attn + jnp.einsum(
                    "bnkhd,bnkhd->bnkh", kg.astype(jnp.float32),
                    tbl.astype(jnp.float32))

        attn = jnp.where(slot_valid[..., None], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=2)
        attn = attn * slot_valid[..., None]
        out = jnp.einsum("bnkh,bnkhd->bnhd", attn.astype(vg.dtype), vg)
        if self.rel_value:
            tv = self.param("relative_pos_value_table",
                            nn.initializers.truncated_normal(0.02),
                            (2 * L, h, hd, 3), jnp.float32)
            for axis in range(3):
                tbl = jnp.take(tv[..., axis], ridx[..., axis], axis=0)
                out = out + jnp.einsum(
                    "bnkh,bnkhd->bnhd", attn, tbl.astype(jnp.float32)
                ).astype(out.dtype)
        out = out.reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class StratifiedBlock(nn.Module):
    embed_channels: int
    num_heads: int
    window_size: float
    quant_size: float
    mlp_expend_ratio: float = 4.0
    drop_path: float = 0.0
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, state, slot_idx, slot_valid, deterministic):
        c = self.embed_channels
        droppath = nn.Dropout(self.drop_path, broadcast_dims=(2,),
                              deterministic=deterministic, name="drop_path")
        x = LayerNorm(c, dtype=self.dtype, name="norm1")(feat)
        x = StratifiedAttention(
            embed_channels=c, num_heads=self.num_heads,
            window_size=self.window_size, quant_size=self.quant_size,
            rel_query=self.rel_query, rel_key=self.rel_key,
            rel_value=self.rel_value, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(x, state, slot_idx, slot_valid, deterministic)
        feat = feat + droppath(x)
        y = LayerNorm(c, dtype=self.dtype, name="norm2")(feat)
        y = nn.Dense(int(c * self.mlp_expend_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return feat + droppath(y)


@MODELS.register_module("ST-v1m2")
class StratifiedTransformer(nn.Module):
    """Reference ST-v1m2 (stratified_transformer_v1m2_refine.py:593-760)."""

    in_channels: int
    num_classes: int
    channels: Tuple[int, ...] = (48, 96, 192, 384, 384)
    num_heads: Tuple[int, ...] = (6, 12, 24, 24)
    depths: Tuple[int, ...] = (3, 9, 3, 3)
    window_size: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.6)
    quant_size: Tuple[float, ...] = (0.01, 0.02, 0.04, 0.08)
    mlp_expend_ratio: float = 4.0
    down_ratio: float = 0.25
    down_num_sample: int = 16
    kp_ball_radius: float = 0.05
    kp_max_neighbor: int = 34
    kp_sigma_radius: float = 0.02  # kp_grid_size * kp_sigma
    drop_path_rate: float = 0.2
    rel_query: bool = True
    rel_key: bool = True
    rel_value: bool = True
    qkv_bias: bool = True
    stem: bool = True
    fine_capacity: int = 48
    coarse_capacity: int = 16
    knn_tile: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point: PointBatch, train: bool = False):
        deterministic = not train
        num_layers = len(self.depths)
        dpr = [float(x) for x in
               _np.linspace(0, self.drop_path_rate, sum(self.depths))]

        state = PointsState(coord=point.coord, mask=point.mask)
        feat = point.feat.astype(self.dtype)

        # KPConv stem over ball-query neighborhoods (reference l.698-716);
        # torch_points_kernels partial_dense pads short rows with -1 shadow
        # neighbors — repeating a real neighbor would double-count it in the
        # KPConv influence sum
        nidx, _ = po.ball_query(
            state.coord, state.mask, self.kp_max_neighbor, self.kp_ball_radius,
            tile=self.knn_tile, pad_mode="shadow",
        )
        x = KPConv(self.in_channels, self.channels[0],
                   point_influence=self.kp_sigma_radius, dtype=self.dtype,
                   name="embed0_kpconv")(feat, nidx, state.coord)
        x = PointBN(self.channels[0], self.dtype, name="embed0_bn")(
            x, state.mask, deterministic)
        feat = nn.leaky_relu(x, negative_slope=0.2)
        if self.stem:
            # KPConvResBlock (reference l.544-591)
            c0 = self.channels[0]
            d2 = c0 // 4
            y = nn.Dense(d2, use_bias=False, dtype=self.dtype,
                         name="embed1_unary1")(feat)
            y = nn.leaky_relu(PointBN(d2, self.dtype, name="embed1_bn1")(
                y, state.mask, deterministic), negative_slope=0.2)
            y = KPConv(d2, d2, point_influence=self.kp_sigma_radius,
                       dtype=self.dtype, name="embed1_kpconv")(
                y, nidx, state.coord)
            y = nn.Dense(c0, use_bias=False, dtype=self.dtype,
                         name="embed1_unary2")(y)
            y = nn.leaky_relu(PointBN(c0, self.dtype, name="embed1_bn2")(
                y, state.mask, deterministic), negative_slope=0.2)
            feat = feat + y

        def transition_down(feat, state, cin, cout, name):
            n = state.mask.shape[-1]
            # per-sample count is int(n_valid * ratio) + 1 (reference
            # TransitionDown.forward, l.465-472) — capacity must cover the
            # fully-valid case
            m = int(n * self.down_ratio) + 1
            idx, smask = po.farthest_point_sampling(state.coord, state.mask, m)
            n_valid = jnp.sum(state.mask, axis=1).astype(jnp.int32)
            n_new = jnp.maximum(
                (n_valid.astype(jnp.float32) * self.down_ratio).astype(jnp.int32)
                + 1, 1)
            new_mask = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1)
                        < jnp.minimum(n_new, m)[:, None])
            new_coord = take_along_points(state.coord, idx)
            kidx, _ = po.knn(state.coord, state.mask, self.down_num_sample,
                             query=new_coord, query_mask=new_mask,
                             tile=self.knn_tile)
            g = po.grouping(kidx, feat, state.coord, with_xyz=False)
            g = LayerNorm(cin, dtype=self.dtype, name=f"{name}_norm")(g)
            g = nn.Dense(cout, use_bias=False, dtype=self.dtype,
                         name=f"{name}_fc")(g)
            g = jnp.where((kidx >= 0)[..., None], g, -jnp.inf).max(axis=2)
            g = jnp.where(new_mask[..., None], g, 0.0).astype(self.dtype)
            return g, PointsState(coord=new_coord, mask=new_mask)

        stem_skip = None
        if self.stem:
            stem_skip = (feat, state)
            feat, state = transition_down(
                feat, state, self.channels[0], self.channels[1], "stem_down")
        stages = []

        for li in range(num_layers):
            cc = self.channels[li + 1]
            ws = self.window_size[li]
            b = state.mask.shape[0]
            big = jnp.asarray(1e10, state.coord.dtype)
            cmin = jnp.min(jnp.where(state.mask[..., None], state.coord, big),
                           axis=1, keepdims=True)
            # FPS downsample set for stratified keys (reference l.355-366):
            # int(n_valid * ratio) + 1 picks per sample
            m_ds = int(state.mask.shape[-1] * self.down_ratio) + 1
            ds_idx, _ = po.farthest_point_sampling(state.coord, state.mask, m_ds)
            nv = jnp.sum(state.mask, axis=1).astype(jnp.int32)
            n_keys = jnp.minimum(
                (nv.astype(jnp.float32) * self.down_ratio).astype(jnp.int32) + 1,
                m_ds,
            )
            pick_ok = (jax.lax.broadcasted_iota(jnp.int32, ds_idx.shape, 1)
                       < n_keys[:, None])
            ds = jnp.zeros(state.mask.shape, bool)
            ds = jax.vmap(
                lambda d, i, ok: d.at[i].max(ok)
            )(ds, ds_idx, pick_ok)
            ds = ds & state.mask

            tables = {}
            for shifted in (False, True):
                off = 0.5 * ws if shifted else 0.0
                f_idx, f_val, f_wc = window_members(
                    state.coord + off, state.mask, ws, cmin, self.fine_capacity)
                c_idx, c_val, _ = window_members(
                    state.coord + 2 * off, state.mask, 2 * ws, cmin,
                    self.coarse_capacity, subset=ds)
                # drop coarse keys sharing the query's fine window
                own_wc = f_wc
                key_wc = take_along_points(
                    f_wc, jnp.maximum(c_idx, 0).reshape(b, -1)
                ).reshape(c_idx.shape + (3,))
                diff = (key_wc != own_wc[:, :, None, :]).any(-1)
                c_val = c_val & diff
                tables[shifted] = (
                    jnp.concatenate([f_idx, c_idx], axis=-1),
                    jnp.concatenate([f_val, c_val], axis=-1),
                )

            for d in range(self.depths[li]):
                slot_idx, slot_valid = tables[d % 2 == 1]
                feat = StratifiedBlock(
                    embed_channels=cc, num_heads=self.num_heads[li],
                    window_size=ws, quant_size=self.quant_size[li],
                    mlp_expend_ratio=self.mlp_expend_ratio,
                    drop_path=dpr[sum(self.depths[:li]) + d],
                    rel_query=self.rel_query, rel_key=self.rel_key,
                    rel_value=self.rel_value, qkv_bias=self.qkv_bias,
                    dtype=self.dtype, name=f"layer{li}_block{d}",
                )(feat, state, slot_idx, slot_valid, deterministic)
            stages.append((feat, state))
            if li < num_layers - 1:
                feat, state = transition_down(
                    feat, state, cc, self.channels[li + 2], f"layer{li}_down")

        # decoder: TransitionUp chain (reference l.735-741)
        feat, state = stages[-1]
        for li in reversed(range(num_layers - 1)):
            skip_feat, skip_state = stages[li]
            cin, cout = self.channels[li + 2], self.channels[li + 1]
            a = LayerNorm(cout, dtype=self.dtype, name=f"up{li}_norm1")(skip_feat)
            a = nn.Dense(cout, dtype=self.dtype, name=f"up{li}_fc1")(a)
            z = LayerNorm(cin, dtype=self.dtype, name=f"up{li}_norm2")(feat)
            z = nn.Dense(cout, dtype=self.dtype, name=f"up{li}_fc2")(z)
            feat = a + po.interpolation(
                state.coord, state.mask, skip_state.coord, skip_state.mask, z)
            state = skip_state

        if self.stem:
            skip_feat, skip_state = stem_skip
            a = LayerNorm(self.channels[0], dtype=self.dtype,
                          name="up_stem_norm1")(skip_feat)
            a = nn.Dense(self.channels[0], dtype=self.dtype,
                         name="up_stem_fc1")(a)
            z = LayerNorm(self.channels[1], dtype=self.dtype,
                          name="up_stem_norm2")(feat)
            z = nn.Dense(self.channels[0], dtype=self.dtype,
                         name="up_stem_fc2")(z)
            feat = a + po.interpolation(
                state.coord, state.mask, skip_state.coord, skip_state.mask, z)
            state = skip_state
        else:
            feat = nn.Dense(self.channels[0], dtype=self.dtype,
                            name="proj_out")(feat)

        logits = nn.Dense(self.channels[0], dtype=self.dtype, name="cls_fc1")(feat)
        logits = nn.relu(PointBN(self.channels[0], self.dtype, name="cls_bn")(
            logits, state.mask, deterministic))
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="cls_fc2")(logits)
        return point.replace(feat=logits, coord=state.coord, mask=state.mask)


@MODELS.register_module("ST-v1m1")
class StratifiedTransformerV1M1(StratifiedTransformer):
    """Alias for the original ST formulation
    (stratified_transformer_v1m1_origin.py:651) — the refined v1m2
    computation path subsumes it in this rebuild; differences in the
    reference are CUDA-kernel-level (v1 vs v2 attention steps) that have a
    single TPU formulation here."""
