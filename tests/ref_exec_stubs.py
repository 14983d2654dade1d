"""EXECUTABLE CPU stand-ins for the reference's CUDA-only deps.

conftest.load_reference_package installs inert stubs — enough to *import*
reference modules for goldens on pure-torch code, but a full-model forward
needs the CUDA libraries to actually execute. This module implements their
documented semantics in pure torch/numpy:

- spconv: SubMConv3d (cross-correlation restricted to active sites,
  out[p] = sum_k W[k] @ x[p + (k - r)]), strided SparseConv3d (pair
  enumeration, indice_key registration), SparseInverseConv3d (kmap replay
  with restored fine coords + spatial shape), SparseSequential/Identity
  with a SparseModule marker base; weight layout [k, k, k, in, out]
  (understood by utils/ckpt_bridge._conv_kernel).
- torch_scatter.segment_csr (sum/mean/min/max).
- pointops: knn_query (per-segment exact kNN, -1 padding), grouping,
  interpolation (IDW k-NN), farthest_point_sampling,
  knn_query_and_group.
- torch_geometric: voxel_grid (injective batch-monotone cluster ids) and
  utils.scatter (sum/mean/max).
- CPU shims for direct torch.cuda.*Tensor constructors.

Companion modules: ts_stub.py (torchsparse for SPVCNN), me_stub.py
(MinkowskiEngine for MinkUNet).

install_executable_stubs() swaps these into sys.modules and purges cached
pointcept.models modules so a subsequent load_reference_package binds the
reference model code against them.
"""

from __future__ import annotations

import itertools
import sys
import types

import numpy as np
import torch
import torch.nn as nn


class SparseModule(nn.Module):
    """Marker base (spconv.SparseModule): modules taking SparseConvTensor."""


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size):
        self.features = features
        self.indices = indices
        self.spatial_shape = list(spatial_shape)
        self.batch_size = batch_size

    def replace_feature(self, feat):
        return SparseConvTensor(
            feat, self.indices, self.spatial_shape, self.batch_size
        )


class SubMConv3d(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=0, dilation=1, bias=True, indice_key=None, **kw):
        super().__init__()
        assert stride == 1 and dilation == 1, "SubM stub supports stride 1"
        k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.kernel_size = k
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.indice_key = indice_key
        self.weight = nn.Parameter(
            torch.empty(k, k, k, in_channels, out_channels)
        )
        nn.init.kaiming_uniform_(
            self.weight.view(-1, out_channels), a=5**0.5
        )
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.bias = None

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        idx = x.indices.cpu().numpy().astype(np.int64)  # [N, 4] (b, x, y, z)
        sx, sy, sz = (int(s) for s in x.spatial_shape[:3])
        key = ((idx[:, 0] * sx + idx[:, 1]) * sy + idx[:, 2]) * sz + idx[:, 3]
        lut = {int(k): i for i, k in enumerate(key)}
        k = self.kernel_size
        r = k // 2
        feat = x.features
        out = feat.new_zeros(feat.shape[0], self.out_channels)
        w = self.weight.view(k * k * k, self.in_channels, self.out_channels)
        for ki, (dx, dy, dz) in enumerate(
            itertools.product(range(-r, r + 1), repeat=3)
        ):
            nk = key + ((dx * sy + dy) * sz + dz)
            rows, nbrs = [], []
            for row, kk in enumerate(nk):
                j = lut.get(int(kk))
                # guard against linearized-key aliasing across grid edges
                if j is not None and (
                    0 <= idx[row, 1] + dx < sx
                    and 0 <= idx[row, 2] + dy < sy
                    and 0 <= idx[row, 3] + dz < sz
                    and idx[j, 0] == idx[row, 0]
                ):
                    rows.append(row)
                    nbrs.append(j)
            if rows:
                out[rows] += feat[nbrs] @ w[ki]
        if self.bias is not None:
            out = out + self.bias
        return x.replace_feature(out)


_INDICE_CACHE: dict = {}


class SparseConv3d(SparseModule):
    """Strided sparse conv (spconv semantics): output position j exists iff
    some input i = j*stride + offset - padding with offset in the kernel
    volume; out[j] += x[i] @ W[offset]. Registers its (in, out, pairs)
    under ``indice_key`` for SparseInverseConv3d."""

    def __init__(self, in_channels, out_channels, kernel_size=2, stride=2,
                 padding=0, bias=True, indice_key=None, **kw):
        super().__init__()
        k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.k, self.stride, self.padding = k, stride, padding
        self.in_channels, self.out_channels = in_channels, out_channels
        self.indice_key = indice_key
        self.weight = nn.Parameter(
            torch.empty(k, k, k, in_channels, out_channels)
        )
        nn.init.kaiming_uniform_(self.weight.view(-1, out_channels), a=5**0.5)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        idx = x.indices.cpu().numpy().astype(np.int64)
        k, s, p = self.k, self.stride, self.padding
        out_pos = {}   # (b, x, y, z) -> out row
        pairs = []     # (kernel_index, in_row, out_row)
        for ki, off in enumerate(
            itertools.product(range(k), repeat=3)
        ):
            num = idx[:, 1:] + p - np.asarray(off)
            ok = (num % s == 0).all(1) & (num >= 0).all(1)
            outc = num // s
            for row in np.nonzero(ok)[0]:
                key = (idx[row, 0], *outc[row])
                j = out_pos.setdefault(key, len(out_pos))
                pairs.append((ki, int(row), j))
        w = self.weight.view(k ** 3, self.in_channels, self.out_channels)
        out = x.features.new_zeros(len(out_pos), self.out_channels)
        for ki, i, j in pairs:
            out[j] += x.features[i] @ w[ki]
        if self.bias is not None:
            out = out + self.bias
        new_idx = torch.tensor(
            [list(kxyz) for kxyz in out_pos], dtype=torch.int32
        )
        new_shape = [max(1, (d + p) // s) for d in x.spatial_shape[:3]]
        if self.indice_key is not None:
            _INDICE_CACHE[self.indice_key] = (
                x.indices, pairs, len(idx), list(x.spatial_shape)
            )
        return SparseConvTensor(out, new_idx, new_shape, x.batch_size)


class SparseInverseConv3d(SparseModule):
    """Reverses the conv registered under ``indice_key``: output indices =
    that conv's input indices; per cached pair (ki, fine, coarse):
    out[fine] += x[coarse] @ W[ki] (same kernel index, roles swapped)."""

    def __init__(self, in_channels, out_channels, kernel_size=2, bias=True,
                 indice_key=None, **kw):
        super().__init__()
        k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.k = k
        self.in_channels, self.out_channels = in_channels, out_channels
        self.indice_key = indice_key
        self.weight = nn.Parameter(
            torch.empty(k, k, k, in_channels, out_channels)
        )
        nn.init.kaiming_uniform_(self.weight.view(-1, out_channels), a=5**0.5)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        # restore the FINE level's indices AND spatial shape — keeping the
        # coarse shape would alias the next SubM conv's position hashing
        fine_indices, pairs, n_fine, fine_shape = _INDICE_CACHE[self.indice_key]
        w = self.weight.view(self.k ** 3, self.in_channels, self.out_channels)
        out = x.features.new_zeros(n_fine, self.out_channels)
        for ki, fine, coarse in pairs:
            out[fine] += x.features[coarse] @ w[ki]
        if self.bias is not None:
            out = out + self.bias
        return SparseConvTensor(out, fine_indices, fine_shape,
                                x.batch_size)


_SPARSE_TYPES = (SubMConv3d, SparseConv3d, SparseInverseConv3d)


class SparseSequential(SparseModule):
    """spconv.SparseSequential: sparse modules act on the SparseConvTensor,
    torch modules on its .features."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        from collections import OrderedDict

        if len(args) == 1 and isinstance(args[0], OrderedDict):
            for k, m in args[0].items():
                self.add_module(k, m)
        else:
            for i, m in enumerate(args):
                self.add_module(str(i), m)
        for k, m in kwargs.items():
            self.add_module(k, m)

    def forward(self, x):
        for m in self._modules.values():
            if isinstance(m, SparseModule):
                x = m(x)
            elif isinstance(x, SparseConvTensor):
                x = x.replace_feature(m(x.features))
            else:
                x = m(x)
        return x


class SparseIdentity(SparseModule):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, x):
        return x


def _inert_class_factory(name):
    cache = {}

    def ga(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        if attr not in cache:
            cache[attr] = type(
                attr, (object,), {"__init__": lambda self, *a, **k: None}
            )
        return cache[attr]

    return ga


def _segment_csr(src, indptr, reduce="sum"):
    indptr = indptr.reshape(-1).long()
    n_seg = indptr.numel() - 1
    out = []
    for s in range(n_seg):
        lo, hi = int(indptr[s]), int(indptr[s + 1])
        seg = src[lo:hi]
        if seg.numel() == 0:
            out.append(src.new_zeros(src.shape[1:]))
        elif reduce == "sum":
            out.append(seg.sum(0))
        elif reduce == "mean":
            out.append(seg.float().mean(0).to(src.dtype))
        elif reduce == "min":
            out.append(seg.min(0).values)
        elif reduce == "max":
            out.append(seg.max(0).values)
        else:
            raise ValueError(reduce)
    return torch.stack(out, 0)


def _knn_query(nsample, xyz, offset, new_xyz=None, new_offset=None):
    """pointops.knn_query semantics (libs/pointops/functions/query.py:7-24):
    per-segment exact kNN (self included), global row indices, -1 padding
    when a segment has fewer than nsample points, euclidean distances."""
    from scipy.spatial import cKDTree

    if new_xyz is None or new_offset is None:
        new_xyz, new_offset = xyz, offset
    xyz_n = xyz.detach().cpu().numpy()
    q_n = new_xyz.detach().cpu().numpy()
    off = np.asarray(offset.detach().cpu(), np.int64)
    noff = np.asarray(new_offset.detach().cpu(), np.int64)
    m = len(q_n)
    idx = np.full((m, nsample), -1, np.int32)
    dist = np.zeros((m, nsample), np.float32)
    s = ns = 0
    for b in range(len(off)):
        e, ne = int(off[b]), int(noff[b])
        kk = min(nsample, e - s)
        d, i = cKDTree(xyz_n[s:e]).query(q_n[ns:ne], k=kk)
        d = np.atleast_2d(d).reshape(ne - ns, kk)
        i = np.atleast_2d(i).reshape(ne - ns, kk)
        idx[ns:ne, :kk] = i + s
        dist[ns:ne, :kk] = d
        s, ns = e, ne
    return torch.from_numpy(idx), torch.from_numpy(dist)


def _grouping(idx, feat, xyz, new_xyz=None, with_xyz=False):
    """pointops.grouping semantics (grouping.py:36-60): gather rows by idx
    (-1 -> zeros), optionally prepend (xyz[j] - new_xyz[i]) zeroed at
    invalid slots."""
    if new_xyz is None:
        new_xyz = xyz
    m, nsample = idx.shape
    c = feat.shape[1]
    idxl = idx.long()
    safe = idxl.clamp(min=0)
    valid = (idxl >= 0).to(feat.dtype)
    grouped = feat[safe.view(-1)].view(m, nsample, c) * valid[..., None]
    if with_xyz:
        gxyz = xyz[safe.view(-1)].view(m, nsample, 3) - new_xyz.unsqueeze(1)
        gxyz = gxyz * valid[..., None]
        return torch.cat([gxyz, grouped], -1)
    return grouped


def _interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
    """pointops.interpolation (interpolation.py:8-24): IDW over k-NN."""
    idx, dist = _knn_query(k, xyz, offset, new_xyz, new_offset)
    recip = 1.0 / (dist + 1e-8)
    weight = recip / recip.sum(1, keepdim=True)
    out = feat.new_zeros(new_xyz.shape[0], feat.shape[1])
    for i in range(k):
        out += feat[idx[:, i].long()] * weight[:, i:i + 1]
    return out


def _farthest_point_sampling(xyz, offset, new_offset):
    """pointops.farthest_point_sampling (sampling_cuda_kernel.cu semantics):
    per segment, start at the first point, greedily take the point
    maximizing min-distance to the selected set; global row indices."""
    xyz_n = xyz.detach().cpu().numpy().astype(np.float64)
    off = np.asarray(offset.detach().cpu(), np.int64)
    noff = np.asarray(new_offset.detach().cpu(), np.int64)
    out = []
    s = ns = 0
    for b in range(len(off)):
        e, ne = int(off[b]), int(noff[b])
        pts = xyz_n[s:e]
        m = ne - ns
        picked = [0]
        dist = np.full(len(pts), np.inf)
        for _ in range(m - 1):
            d = np.sum((pts - pts[picked[-1]]) ** 2, axis=1)
            dist = np.minimum(dist, d)
            picked.append(int(np.argmax(dist)))
        out.extend(p + s for p in picked)
        s, ns = e, ne
    return torch.tensor(out, dtype=torch.int32)


def _knn_query_and_group(feat, xyz, offset=None, new_xyz=None,
                         new_offset=None, idx=None, nsample=None,
                         with_xyz=False):
    """pointops.knn_query_and_group (functions/utils.py:5-19)."""
    if idx is None:
        idx, _ = _knn_query(nsample, xyz, offset, new_xyz, new_offset)
    return _grouping(idx, feat, xyz, new_xyz, with_xyz), idx


def _voxel_grid(pos, size, batch=None, start=None, end=None):
    """torch_geometric voxel_grid (both signatures): injective int64 cluster
    ids, monotone in (batch, cell) — only the equivalence classes and the
    per-batch grouping of sorted ids are semantically load-bearing.
    start=None anchors at the global per-axis minimum (torch_geometric
    semantics). Old-style positional calls (pos, batch, size) — as the
    stratified transformer makes (v1m2_refine.py:56) — are detected by the
    integer batch tensor landing in the ``size`` slot."""
    if (torch.is_tensor(size) and not size.dtype.is_floating_point
            and size.numel() == len(pos)):
        size, batch = batch, size  # legacy (pos, batch, size) order
    p = pos.detach().cpu().numpy().astype(np.float64)
    sz = (size.detach().cpu().numpy() if torch.is_tensor(size)
          else np.asarray(size, np.float64))
    sz = np.broadcast_to(np.asarray(sz, np.float64).reshape(-1), (3,))
    if start is None:
        anchor = p.min(0)
    else:
        a = (start.detach().cpu().numpy() if torch.is_tensor(start)
             else np.asarray(start, np.float64))
        anchor = np.broadcast_to(np.asarray(a, np.float64).reshape(-1), (3,))
    c = np.floor((p - anchor) / sz).astype(np.int64)
    c -= c.min(0)
    dims = c.max(0) + 1
    b = (np.zeros(len(c), np.int64) if batch is None
         else batch.detach().cpu().numpy().astype(np.int64))
    cid = ((b * dims[0] + c[:, 0]) * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
    return torch.from_numpy(cid)


def _tg_scatter(src, index, dim=0, dim_size=None, reduce="sum"):
    """torch_geometric.utils.scatter (sum/mean/max) along dim 0."""
    assert dim == 0
    index = index.long()
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    shape = (n,) + tuple(src.shape[1:])
    if reduce in ("sum", "add", "mean"):
        out = src.new_zeros(shape)
        out.index_add_(0, index, src)
        if reduce == "mean":
            cnt = src.new_zeros(n).index_add_(
                0, index, src.new_ones(len(index))
            ).clamp(min=1)
            out = out / cnt.view((n,) + (1,) * (src.ndim - 1))
        return out
    if reduce in ("max", "amax"):
        out = src.new_full(shape, float("-inf"))
        out.index_reduce_(0, index, src, "amax", include_self=True)
        return out.masked_fill(out == float("-inf"), 0)
    raise ValueError(reduce)


def install_executable_stubs():
    spconv_pytorch = types.ModuleType("spconv.pytorch")
    spconv_pytorch.__path__ = []
    spconv_pytorch.SparseConvTensor = SparseConvTensor
    spconv_pytorch.SubMConv3d = SubMConv3d
    spconv_pytorch.SparseConv3d = SparseConv3d
    spconv_pytorch.SparseInverseConv3d = SparseInverseConv3d
    spconv_pytorch.SparseSequential = SparseSequential
    spconv_pytorch.Identity = SparseIdentity
    spconv_pytorch.SparseModule = SparseModule
    modules_mod = types.ModuleType("spconv.pytorch.modules")
    modules_mod.is_spconv_module = lambda m: isinstance(m, SparseModule)
    modules_mod.SparseModule = SparseModule
    spconv_pytorch.modules = modules_mod
    # anything else (SparseSequential, SparseConv3d, ...) imports inertly
    spconv_pytorch.__getattr__ = _inert_class_factory("spconv.pytorch")

    spconv_pkg = types.ModuleType("spconv")
    spconv_pkg.__path__ = []
    spconv_pkg.pytorch = spconv_pytorch
    spconv_pkg.__getattr__ = _inert_class_factory("spconv")

    tscatter = types.ModuleType("torch_scatter")
    tscatter.__path__ = []
    tscatter.segment_csr = _segment_csr
    tscatter.__getattr__ = _inert_class_factory("torch_scatter")

    pointops_mod = types.ModuleType("pointops")
    pointops_mod.__path__ = []
    pointops_mod.knn_query = _knn_query
    pointops_mod.grouping = _grouping
    pointops_mod.interpolation = _interpolation
    pointops_mod.farthest_point_sampling = _farthest_point_sampling
    pointops_mod.knn_query_and_group = _knn_query_and_group
    pointops_mod.__getattr__ = _inert_class_factory("pointops")

    tg = types.ModuleType("torch_geometric")
    tg.__path__ = []
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.__path__ = []
    tg_pool = types.ModuleType("torch_geometric.nn.pool")
    tg_pool.__path__ = []
    tg_pool.voxel_grid = _voxel_grid
    tg_pool.__getattr__ = _inert_class_factory("torch_geometric.nn.pool")
    tg_nn.pool = tg_pool
    tg_nn.voxel_grid = _voxel_grid
    tg_nn.__getattr__ = _inert_class_factory("torch_geometric.nn")
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.__path__ = []
    tg_utils.scatter = _tg_scatter
    tg_utils.__getattr__ = _inert_class_factory("torch_geometric.utils")
    tg.nn = tg_nn
    tg.utils = tg_utils
    tg.__getattr__ = _inert_class_factory("torch_geometric")

    sys.modules["spconv"] = spconv_pkg
    sys.modules["spconv.pytorch"] = spconv_pytorch
    sys.modules["spconv.pytorch.modules"] = modules_mod
    sys.modules["torch_scatter"] = tscatter
    sys.modules["pointops"] = pointops_mod
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.nn.pool"] = tg_pool
    sys.modules["torch_geometric.utils"] = tg_utils

    # reference code constructs torch.cuda.*Tensor directly (e.g.
    # point_transformer_seg.py:100); shim CPU equivalents on CPU-only torch
    if not torch.cuda.is_available():
        def _cpu_tensor(dtype):
            def make(*args):
                if len(args) == 1 and isinstance(args[0], (list, tuple)):
                    return torch.tensor(args[0], dtype=dtype)
                return torch.zeros(*args, dtype=dtype)

            return make

        torch.cuda.IntTensor = _cpu_tensor(torch.int32)
        torch.cuda.LongTensor = _cpu_tensor(torch.int64)
        torch.cuda.FloatTensor = _cpu_tensor(torch.float32)

    # cached reference model modules were bound to the inert stubs
    for name in [n for n in sys.modules if n.startswith("pointcept.models")]:
        del sys.modules[name]
