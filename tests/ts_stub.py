"""EXECUTABLE torchsparse (v1.4 API) stand-in for the SPVCNN golden.

Implements the exact surface pointcept/models/spvcnn/ts_spvcnn.py touches:
SparseTensor / PointTensor, sphash/sphashquery/spcount/spvoxelize/
spdevoxelize/calc_ti_weights, get_kernel_offsets, spnn.Conv3d (stride 1
"submanifold", stride 2 downsample, transposed upsample via kmap replay,
k=1 pointwise), spnn.BatchNorm/ReLU, torchsparse.cat.

Conventions (documented torchsparse 1.4 semantics):
- coords [N, 4] = (x, y, z, batch); tensor ``stride`` grows 1->2->4...
  with coords kept in original units.
- kernel offsets enumerate itertools.product x-major; odd kernels span
  {-s, 0, s}^3 * dilation, even kernels {0, s}^3 (the 8 cell corners used
  by voxel_to_point).
- conv weight is a Parameter named ``kernel``: [k^3, in, out] (k>1) or
  [in, out] (k=1).
- calc_ti_weights: trilinear weights of each point in its stride-cell,
  zeroed at missing corners and RENORMALIZED by the remaining sum.
- transposed conv replays the cached kmap of the downsample with the same
  stride transition, roles swapped, same kernel index per pair.
"""

from __future__ import annotations

import itertools
import sys
import types

import numpy as np
import torch
import torch.nn as nn

_HASH_B = 1 << 20  # coords fit comfortably below this


def _pack(c4):
    c = c4.astype(np.int64)
    return ((c[:, 3] * _HASH_B + c[:, 0]) * _HASH_B + c[:, 1]) * _HASH_B + c[:, 2]


class SparseTensor:
    def __init__(self, feats, coords, stride=1):
        self.F = feats
        self.C = coords
        self.s = (stride, stride, stride) if isinstance(stride, int) else tuple(stride)
        self.cmaps = {}
        self.kmaps = {}

    @property
    def stride(self):
        return self.s

    @property
    def coords(self):
        return self.C

    @property
    def feats(self):
        return self.F

    def __add__(self, other):
        y = SparseTensor(self.F + other.F, self.C, self.s)
        y.cmaps, y.kmaps = self.cmaps, self.kmaps
        return y


class PointTensor:
    def __init__(self, feats, coords, idx_query=None, weights=None):
        self.F = feats
        self.C = coords
        self.idx_query = idx_query if idx_query is not None else {}
        self.weights = weights if weights is not None else {}
        self.additional_features = {"idx_query": {}, "counts": {}}


def sphash(coords, offsets=None):
    c = coords.detach().cpu().numpy().astype(np.int64)
    if offsets is None:
        return torch.from_numpy(_pack(c))
    off = offsets.detach().cpu().numpy().astype(np.int64)
    out = np.empty((len(off), len(c)), np.int64)
    for k, o in enumerate(off):
        shifted = c.copy()
        shifted[:, :3] += o
        out[k] = _pack(shifted)
    return torch.from_numpy(out)


def sphashquery(queries, references):
    ref = references.detach().cpu().numpy()
    lut = {int(v): i for i, v in enumerate(ref)}
    q = queries.detach().cpu().numpy()
    out = np.full(q.shape, -1, np.int64)
    flat_q = q.reshape(-1)
    flat_o = out.reshape(-1)
    for i, v in enumerate(flat_q):
        flat_o[i] = lut.get(int(v), -1)
    return torch.from_numpy(out)


def spcount(idx, n):
    i = idx.detach().cpu().numpy().astype(np.int64)
    counts = np.bincount(i[i >= 0], minlength=int(n)).astype(np.int32)
    return torch.from_numpy(counts)


def spvoxelize(feat, idx, counts):
    n = counts.shape[0]
    out = feat.new_zeros(n, *feat.shape[1:])
    ok = idx >= 0
    out.index_add_(0, idx[ok].long(), feat[ok])
    denom = counts.clamp(min=1).to(feat.dtype)
    return out / denom.view(-1, *([1] * (feat.ndim - 1)))


def spdevoxelize(feat, idx, weights):
    # idx, weights: [N, 8]
    safe = idx.clamp(min=0).long()
    gathered = feat[safe.reshape(-1)].reshape(*idx.shape, feat.shape[-1])
    w = weights * (idx >= 0).to(weights.dtype)
    return (gathered * w.unsqueeze(-1)).sum(1)


def calc_ti_weights(coords, idx_query, scale=1):
    # coords: [N, 4] float (x, y, z, b); idx_query: [8, N]
    p = coords[:, :3].detach().cpu().numpy().astype(np.float64)
    s = float(scale)
    base = np.floor(p / s) * s
    frac = (p - base) / s  # in [0, 1)
    offs = np.array(list(itertools.product((0, 1), repeat=3)), np.float64)
    w = np.empty((8, len(p)))
    for k, o in enumerate(offs):
        w[k] = np.prod(1.0 - np.abs(frac - o), axis=1)
    w = torch.from_numpy(w).to(torch.float32)
    w = w * (idx_query >= 0).to(w.dtype)
    w = w / (w.sum(0, keepdim=True) + 1e-8)
    return w


def get_kernel_offsets(size, stride=1, dilation=1, device=None):
    s = stride[0] if isinstance(stride, (tuple, list)) else stride
    if size % 2 == 1:
        r = size // 2
        rng = range(-r, r + 1)
    else:
        rng = range(size)
    offs = [
        (dx * s * dilation, dy * s * dilation, dz * s * dilation)
        for dx, dy, dz in itertools.product(rng, repeat=3)
    ]
    return torch.tensor(offs, dtype=torch.int32)


class Conv3d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 dilation=1, bias=False, transposed=False):
        super().__init__()
        k = kernel_size
        self.k, self.stride_, self.dilation = k, stride, dilation
        self.in_channels, self.out_channels = in_channels, out_channels
        self.transposed = transposed
        if k == 1:
            self.kernel = nn.Parameter(torch.empty(in_channels, out_channels))
        else:
            self.kernel = nn.Parameter(
                torch.empty(k ** 3, in_channels, out_channels)
            )
        nn.init.normal_(self.kernel, 0,
                        (2.0 / (in_channels * k ** 3)) ** 0.5)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

    def forward(self, x: SparseTensor) -> SparseTensor:
        if self.k == 1:
            out = x.F @ self.kernel
            if self.bias is not None:
                out = out + self.bias
            y = SparseTensor(out, x.C, x.s)
            y.cmaps, y.kmaps = x.cmaps, x.kmaps
            return y
        if self.transposed:
            return self._transposed(x)
        s_in = x.s[0]
        c = x.C.detach().cpu().numpy().astype(np.int64)
        offs = get_kernel_offsets(self.k, s_in, self.dilation).numpy()
        if self.stride_ == 1:
            out_c = c
            out_s = s_in
        else:
            assert self.stride_ == 2 and self.k == 2
            out_s = s_in * 2
            q = c.copy()
            q[:, :3] = (q[:, :3] // out_s) * out_s
            keys, inv = np.unique(_pack(q), return_inverse=True)
            first = np.zeros(len(keys), np.int64)
            first[inv[::-1]] = np.arange(len(c))[::-1]
            out_c = q[first]
        in_lut = {int(v): i for i, v in enumerate(_pack(c))}
        out = x.F.new_zeros(len(out_c), self.out_channels)
        pairs = []
        for ki, o in enumerate(offs):
            probe = out_c.copy()
            probe[:, :3] += o
            rows, ins = [], []
            for j, key in enumerate(_pack(probe)):
                i = in_lut.get(int(key))
                if i is not None:
                    rows.append(j)
                    ins.append(i)
            if rows:
                out[rows] += x.F[ins] @ self.kernel[ki]
                pairs.extend((ki, i, j) for i, j in zip(ins, rows))
        if self.bias is not None:
            out = out + self.bias
        y = SparseTensor(out, torch.from_numpy(
            out_c.astype(np.int32)), out_s)
        y.cmaps = dict(x.cmaps)
        y.kmaps = dict(x.kmaps)
        y.cmaps[(out_s,) * 3] = y.C
        if self.stride_ != 1:
            y.kmaps[(s_in, out_s)] = (x.C, pairs, len(c))
        return y

    def _transposed(self, x: SparseTensor) -> SparseTensor:
        s_in = x.s[0]
        s_out = s_in // 2
        fine_coords, pairs, n_fine = x.kmaps[(s_out, s_in)]
        out = x.F.new_zeros(n_fine, self.out_channels)
        for ki, fine, coarse in pairs:
            out[fine] += x.F[coarse] @ self.kernel[ki]
        if self.bias is not None:
            out = out + self.bias
        y = SparseTensor(out, fine_coords, s_out)
        y.cmaps, y.kmaps = dict(x.cmaps), dict(x.kmaps)
        return y


class BatchNorm(nn.BatchNorm1d):
    def forward(self, x):
        if isinstance(x, SparseTensor):
            y = SparseTensor(super().forward(x.F), x.C, x.s)
            y.cmaps, y.kmaps = x.cmaps, x.kmaps
            return y
        return super().forward(x)


class ReLU(nn.ReLU):
    def forward(self, x):
        if isinstance(x, SparseTensor):
            y = SparseTensor(super().forward(x.F), x.C, x.s)
            y.cmaps, y.kmaps = x.cmaps, x.kmaps
            return y
        return super().forward(x)


def ts_cat(tensors):
    y = SparseTensor(
        torch.cat([t.F for t in tensors], dim=1), tensors[0].C, tensors[0].s
    )
    y.cmaps, y.kmaps = tensors[0].cmaps, tensors[0].kmaps
    return y


def install_torchsparse_stub():
    ts = types.ModuleType("torchsparse")
    ts.__path__ = []
    ts.SparseTensor = SparseTensor
    ts.PointTensor = PointTensor
    ts.cat = ts_cat

    ts_nn = types.ModuleType("torchsparse.nn")
    ts_nn.__path__ = []
    ts_nn.Conv3d = Conv3d
    ts_nn.BatchNorm = BatchNorm
    ts_nn.ReLU = ReLU

    ts_f = types.ModuleType("torchsparse.nn.functional")
    ts_f.__path__ = []
    ts_f.sphash = sphash
    ts_f.sphashquery = sphashquery
    ts_f.spcount = spcount
    ts_f.spvoxelize = spvoxelize
    ts_f.spdevoxelize = spdevoxelize
    ts_f.calc_ti_weights = calc_ti_weights

    ts_utils = types.ModuleType("torchsparse.nn.utils")
    ts_utils.__path__ = []
    ts_utils.get_kernel_offsets = get_kernel_offsets

    ts_nn.functional = ts_f
    ts_nn.utils = ts_utils
    ts.nn = ts_nn

    sys.modules["torchsparse"] = ts
    sys.modules["torchsparse.nn"] = ts_nn
    sys.modules["torchsparse.nn.functional"] = ts_f
    sys.modules["torchsparse.nn.utils"] = ts_utils

    for name in [n for n in sys.modules if n.startswith("pointcept.models")]:
        del sys.modules[name]
