"""Executable CPU stand-ins for the Stratified-Transformer dependency stack:
``torch_points_kernels`` (ball_query), ``torch_points3d`` (KPConvLayer,
FastBatchNorm1d) and ``pointops2`` (FPS / kNN grouping / interpolation +
the three fused window-attention kernels).

Reimplements the library SEMANTICS the reference model relies on
(stratified_transformer_v1m2_refine.py:14-33, 100-230, 460-530) so the
full torch model can execute on CPU for golden tests — the same playbook
as tests/ts_stub.py (torchsparse) and tests/me_stub.py (MinkowskiEngine).

One deliberate substitution: torch_points3d generates its 15 kernel-point
disposition by a seeded Lloyd optimization we cannot reproduce without the
library; the stub instead uses scenesplat_tpu's deterministic
Fibonacci-sphere layout on BOTH sides (the layout is a constant tensor —
equivalent to bridging a non-trainable parameter). Everything else
(shadow-neighbor handling, linear influence, per-kernel-point matmul
aggregation) follows torch_points3d's KPConv_ops.
"""

import sys
import types

import numpy as np
import torch

from tests.ref_exec_stubs import (
    _farthest_point_sampling,
    _inert_class_factory,
    _interpolation,
    _knn_query,
)


# ---------------------------------------------------------------------------
# torch_points_kernels.ball_query (partial_dense mode)
# ---------------------------------------------------------------------------

def _ball_query(radius, nsample, x, y, mode="partial_dense", batch_x=None,
                batch_y=None):
    """For each y point: up to ``nsample`` x-point indices within ``radius``
    in the same batch element, ascending index order, -1 padding. Returns
    (idx [Ny, nsample] long, dist2) like torch_points_kernels."""
    assert mode == "partial_dense"
    xn = x.detach().cpu().numpy()
    yn = y.detach().cpu().numpy()
    bx = batch_x.detach().cpu().numpy()
    by = batch_y.detach().cpu().numpy()
    m = len(yn)
    idx = np.full((m, nsample), -1, np.int64)
    dist = np.full((m, nsample), -1.0, np.float32)
    for b in np.unique(by):
        xsel = np.flatnonzero(bx == b)
        ysel = np.flatnonzero(by == b)
        d2 = ((yn[ysel][:, None] - xn[xsel][None]) ** 2).sum(-1)
        within = d2 <= radius * radius
        for row, yi in enumerate(ysel):
            hits = xsel[within[row]][:nsample]
            idx[yi, : len(hits)] = hits
            dist[yi, : len(hits)] = d2[row][within[row]][: nsample]
    return torch.from_numpy(idx), torch.from_numpy(dist)


# ---------------------------------------------------------------------------
# torch_points3d: KPConvLayer + FastBatchNorm1d
# ---------------------------------------------------------------------------

def _fibonacci_kernel_points(k: int) -> np.ndarray:
    from scenesplat_tpu.models.stratified import KPConv

    return KPConv._kernel_points(k)


class KPConvLayer(torch.nn.Module):
    """torch_points3d KPConvLayer semantics (modules/KPConv/kernels.py):
    fixed kernel points, linear influence clamp(1 - d/extent, 0), shadow
    neighbors (idx < 0) contribute nothing, sum aggregation, per-kernel
    matmul with weight [P, Cin, Cout]."""

    def __init__(self, num_inputs, num_outputs, point_influence,
                 n_kernel_points=15, add_one=False, **kwargs):
        super().__init__()
        assert not add_one
        self.point_influence = float(point_influence)
        kp = _fibonacci_kernel_points(n_kernel_points) * self.point_influence
        self.K_points = torch.nn.Parameter(
            torch.from_numpy(kp.astype(np.float32)), requires_grad=False
        )
        weights = torch.empty(n_kernel_points, num_inputs, num_outputs)
        torch.nn.init.xavier_normal_(weights)
        self.weight = torch.nn.Parameter(weights)

    def forward(self, query_points, support_points, neighbors, x):
        valid = neighbors >= 0  # [N, M]
        safe = neighbors.clamp(min=0).long()
        neigh_pts = support_points[safe]  # [N, M, 3]
        rel = neigh_pts - query_points.unsqueeze(1)
        # [N, M, P] linear influence to each kernel point
        diff = rel.unsqueeze(2) - self.K_points.unsqueeze(0).unsqueeze(0)
        d = diff.pow(2).sum(-1).sqrt()
        infl = torch.clamp(1.0 - d / self.point_influence, min=0.0)
        infl = infl * valid.unsqueeze(-1).to(infl.dtype)
        feats = x[safe] * valid.unsqueeze(-1).to(x.dtype)  # [N, M, Cin]
        weighted = torch.einsum("nmp,nmc->npc", infl, feats)
        return torch.einsum("npc,pcd->nd", weighted, self.weight)


class FastBatchNorm1d(torch.nn.Module):
    """torch_points3d core/common_modules: BatchNorm1d over [N, C] features
    (named ``batch_norm`` so state-dict keys match the real library)."""

    def __init__(self, num_features, momentum=0.1, **kwargs):
        super().__init__()
        self.batch_norm = torch.nn.BatchNorm1d(num_features, momentum=momentum)

    def forward(self, x):
        if x.dim() == 2:
            return self.batch_norm(x)
        if x.dim() == 3:  # [B, C, L]
            return self.batch_norm(x)
        raise ValueError(x.shape)


# ---------------------------------------------------------------------------
# pointops2: fused scatter attention kernels
# (libs/pointops2/functions/pointops.py semantics)
# ---------------------------------------------------------------------------

def _attention_step1_v2(q, k, index_1, index_0_offsets, n_max):
    """out[m, h] = sum_d q[i(m), h, d] * k[index_1[m], h, d] where i(m) is
    the query point owning pair slot m (offsets give each point's range)."""
    n = q.shape[0]
    counts = index_0_offsets[1:] - index_0_offsets[:-1]
    index_0 = torch.repeat_interleave(
        torch.arange(n, dtype=torch.long), counts.long()
    )
    return (q[index_0] * k[index_1.long()]).sum(-1)  # [M, h]


def _dot_prod_with_idx_v3(q, index_0_offsets, n_max, k, index_1,
                          table_q, table_k, rel_idx):
    """Relative-position bias: for each pair m and head h,
    sum_d q[i,h,d] * sum_t table_q[rel_idx[m,t], h, d, t]
        + k[j,h,d] * sum_t table_k[rel_idx[m,t], h, d, t]."""
    n = q.shape[0]
    counts = index_0_offsets[1:] - index_0_offsets[:-1]
    index_0 = torch.repeat_interleave(
        torch.arange(n, dtype=torch.long), counts.long()
    )
    ril = rel_idx.long()  # [M, 3]
    # [M, h, d] summed over the three axes' table entries
    tq = sum(table_q[ril[:, t], :, :, t] for t in range(3))
    tk = sum(table_k[ril[:, t], :, :, t] for t in range(3))
    bias_q = (q[index_0] * tq).sum(-1)
    bias_k = (k[index_1.long()] * tk).sum(-1)
    return bias_q + bias_k


def _attention_step2(attn, v, index_0, index_1):
    n = int(index_0.max()) + 1
    h, d = v.shape[1], v.shape[2]
    out = v.new_zeros(n, h, d)
    contrib = attn.unsqueeze(-1) * v[index_1.long()]
    out.index_add_(0, index_0.long(), contrib)
    return out


def _attention_step2_with_rel_pos_value_v2(attn, v, index_0_offsets, n_max,
                                           index_1, table, rel_idx):
    """x[i, h, :] = sum_m attn[m, h] * (v[j(m), h, :] +
    sum_t table[rel_idx[m,t], h, :, t])."""
    n = index_0_offsets.shape[0] - 1
    counts = index_0_offsets[1:] - index_0_offsets[:-1]
    index_0 = torch.repeat_interleave(
        torch.arange(n, dtype=torch.long), counts.long()
    )
    ril = rel_idx.long()
    tv = sum(table[ril[:, t], :, :, t] for t in range(3))  # [M, h, d]
    contrib = attn.unsqueeze(-1) * (v[index_1.long()] + tv)
    out = v.new_zeros(n, v.shape[1], v.shape[2])
    out.index_add_(0, index_0, contrib)
    return out


def _queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                   use_xyz=True):
    if idx is None:
        idx, _ = _knn_query(nsample, xyz, offset, new_xyz, new_offset)
    m = new_xyz.shape[0]
    safe = idx.long().clamp(min=0)
    grouped_feat = feat[safe.view(-1)].view(m, nsample, feat.shape[1])
    if use_xyz:
        gxyz = xyz[safe.view(-1)].view(m, nsample, 3) - new_xyz.unsqueeze(1)
        return torch.cat([gxyz, grouped_feat], -1)
    return grouped_feat


def _scatter_softmax(src, index, dim=0):
    """torch_scatter.scatter_softmax along dim 0 for [M, H] src."""
    assert dim == 0
    n = int(index.max()) + 1
    idx = index.long().unsqueeze(-1).expand_as(src)
    maxes = src.new_full((n, src.shape[1]), float("-inf"))
    maxes = maxes.scatter_reduce(0, idx, src, reduce="amax",
                                 include_self=True)
    ex = (src - maxes[index.long()]).exp()
    sums = src.new_zeros(n, src.shape[1]).scatter_add(0, idx, ex)
    return ex / sums[index.long()]


def install_tp3d_stubs():
    """Install executable torch_points_kernels / torch_points3d / pointops2
    modules (and torch_scatter.scatter_softmax) into sys.modules. Call
    BEFORE load_reference_package so the reference's try-imports bind to
    these instead of going inert."""
    tpk = types.ModuleType("torch_points_kernels")
    tpk.__path__ = []
    tpk.ball_query = _ball_query
    tpk.__getattr__ = _inert_class_factory("torch_points_kernels")

    tp3d = types.ModuleType("torch_points3d")
    tp3d.__path__ = []
    tp3d_modules = types.ModuleType("torch_points3d.modules")
    tp3d_modules.__path__ = []
    tp3d_kp = types.ModuleType("torch_points3d.modules.KPConv")
    tp3d_kp.__path__ = []
    tp3d_kernels = types.ModuleType("torch_points3d.modules.KPConv.kernels")
    tp3d_kernels.KPConvLayer = KPConvLayer
    tp3d_kp.kernels = tp3d_kernels
    tp3d_modules.KPConv = tp3d_kp
    tp3d_core = types.ModuleType("torch_points3d.core")
    tp3d_core.__path__ = []
    tp3d_common = types.ModuleType("torch_points3d.core.common_modules")
    tp3d_common.FastBatchNorm1d = FastBatchNorm1d
    tp3d_core.common_modules = tp3d_common
    tp3d.modules = tp3d_modules
    tp3d.core = tp3d_core

    po2 = types.ModuleType("pointops2")
    po2.__path__ = []
    po2_fn = types.ModuleType("pointops2.pointops")
    po2_fn.furthestsampling = _farthest_point_sampling
    po2_fn.knnquery = _knn_query
    po2_fn.queryandgroup = _queryandgroup
    po2_fn.interpolation = _interpolation
    po2_fn.attention_step1_v2 = _attention_step1_v2
    po2_fn.dot_prod_with_idx_v3 = _dot_prod_with_idx_v3
    po2_fn.attention_step2 = _attention_step2
    po2_fn.attention_step2_with_rel_pos_value_v2 = (
        _attention_step2_with_rel_pos_value_v2
    )
    po2_fn.__getattr__ = _inert_class_factory("pointops2.pointops")
    po2.pointops = po2_fn

    for name, mod in [
        ("torch_points_kernels", tpk),
        ("torch_points3d", tp3d),
        ("torch_points3d.modules", tp3d_modules),
        ("torch_points3d.modules.KPConv", tp3d_kp),
        ("torch_points3d.modules.KPConv.kernels", tp3d_kernels),
        ("torch_points3d.core", tp3d_core),
        ("torch_points3d.core.common_modules", tp3d_common),
        ("pointops2", po2),
        ("pointops2.pointops", po2_fn),
    ]:
        sys.modules[name] = mod

    # augment the torch_scatter stub (installed by install_executable_stubs)
    ts = sys.modules.get("torch_scatter")
    if ts is not None:
        ts.scatter_softmax = _scatter_softmax

    # reference model modules cached against the inert stubs must re-import
    for name in [n for n in sys.modules if n.startswith("pointcept.models")]:
        del sys.modules[name]
