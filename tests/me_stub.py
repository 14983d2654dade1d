"""EXECUTABLE MinkowskiEngine stand-in for the MinkUNet golden.

Implements the surface pointcept/models/sparse_unet/mink_unet.py touches:
TensorField (+quantization enums) / SparseTensor with batch-FIRST [N, 4]
coords, MinkowskiConvolution (k1 pointwise, k3/k5 stride-1, k2 stride-2
downsample), MinkowskiConvolutionTranspose (kmap replay by stride
transition), MinkowskiBatchNorm (wraps an inner ``bn`` BatchNorm1d, the ME
state-dict layout), MinkowskiReLU, ME.cat, utils.kaiming_normal_,
``.slice(field)`` back to field rows.

Conventions (documented ME semantics): coords stay in original units with
tensor_stride growing 1->2->4...; odd kernels span {-s, 0, s}^3, even
kernels {0, s}^3, offsets enumerated itertools.product x-major; conv
kernel param is ``kernel`` [k^3, in, out] (k>1) or [in, out] (k=1);
strided conv outputs the stride-quantized unique coords; transpose conv
restores the cached finer-stride coords replaying the downsample's pairs
with the same kernel index.
"""

from __future__ import annotations

import itertools
import sys
import types

import numpy as np
import torch
import torch.nn as nn

_B = 1 << 20


def _pack(c4):  # [N, 4] = (batch, x, y, z)
    c = c4.astype(np.int64)
    return ((c[:, 0] * _B + c[:, 1]) * _B + c[:, 2]) * _B + c[:, 3]


class SparseTensor:
    def __init__(self, feats, coords, stride=1, cmaps=None, kmaps=None):
        self.F = feats
        self.C = coords
        self.tensor_stride = (
            (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        )
        self.cmaps = cmaps if cmaps is not None else {}
        self.kmaps = kmaps if kmaps is not None else {}

    def _like(self, feats):
        return SparseTensor(feats, self.C, self.tensor_stride,
                            self.cmaps, self.kmaps)

    def __add__(self, other):
        return self._like(self.F + other.F)

    __iadd__ = __add__

    def slice(self, field):
        # field rows -> sparse rows (identity when coords were unique)
        lut = {int(k): i for i, k in enumerate(
            _pack(self.C.detach().cpu().numpy()))}
        fc = field.C.detach().cpu().numpy().astype(np.int64)
        idx = np.array([lut[int(k)] for k in _pack(fc)], np.int64)
        return types.SimpleNamespace(F=self.F[torch.from_numpy(idx)])


class TensorField:
    def __init__(self, feats, coordinates=None, quantization_mode=None,
                 minkowski_algorithm=None, device=None, **kw):
        self.F = feats
        self.C = coordinates

    def sparse(self):
        c = self.C.detach().cpu().numpy().astype(np.int64)
        keys, first, inv, counts = np.unique(
            _pack(c), return_index=True, return_inverse=True,
            return_counts=True,
        )
        # UNWEIGHTED_AVERAGE over duplicate coords
        f = self.F.new_zeros(len(keys), self.F.shape[1])
        f.index_add_(0, torch.from_numpy(inv), self.F)
        f = f / torch.from_numpy(counts).to(f.dtype).unsqueeze(1)
        return SparseTensor(f, self.C[torch.from_numpy(first)], 1)


def _offsets(k, s):
    rng = range(-(k // 2), k // 2 + 1) if k % 2 == 1 else range(k)
    return [(dx * s, dy * s, dz * s)
            for dx, dy, dz in itertools.product(rng, repeat=3)]


class MinkowskiConvolution(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 dilation=1, bias=False, dimension=3):
        super().__init__()
        self.k, self.stride_ = kernel_size, stride
        self.in_channels, self.out_channels = in_channels, out_channels
        if kernel_size == 1:
            self.kernel = nn.Parameter(
                torch.empty(in_channels, out_channels))
        else:
            self.kernel = nn.Parameter(
                torch.empty(kernel_size ** 3, in_channels, out_channels))
        nn.init.normal_(self.kernel, 0, 0.05)
        self.bias = (nn.Parameter(torch.zeros(out_channels)) if bias
                     else None)

    def forward(self, x: SparseTensor) -> SparseTensor:
        if self.k == 1:
            out = x.F @ self.kernel
            if self.bias is not None:
                out = out + self.bias
            return x._like(out)
        s_in = x.tensor_stride[0]
        c = x.C.detach().cpu().numpy().astype(np.int64)
        if self.stride_ == 1:
            out_c, out_s = c, s_in
        else:
            assert self.stride_ == 2 and self.k == 2
            out_s = s_in * 2
            q = c.copy()
            q[:, 1:] = (q[:, 1:] // out_s) * out_s
            keys, first = np.unique(_pack(q), return_index=True)
            out_c = q[np.sort(first)]
        lut = {int(v): i for i, v in enumerate(_pack(c))}
        out = x.F.new_zeros(len(out_c), self.out_channels)
        pairs = []
        for ki, o in enumerate(_offsets(self.k, s_in)):
            probe = out_c.copy()
            probe[:, 1:] += np.asarray(o)
            for j, key in enumerate(_pack(probe)):
                i = lut.get(int(key))
                if i is not None:
                    out[j] += x.F[i] @ self.kernel[ki]
                    pairs.append((ki, i, j))
        if self.bias is not None:
            out = out + self.bias
        y = SparseTensor(out, torch.from_numpy(out_c.astype(np.int32)),
                         out_s, dict(x.cmaps), dict(x.kmaps))
        if self.stride_ != 1:
            y.kmaps[(s_in, out_s)] = (x.C, pairs, len(c))
        return y


class MinkowskiConvolutionTranspose(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=2, stride=2,
                 dilation=1, bias=False, dimension=3):
        super().__init__()
        self.k = kernel_size
        self.in_channels, self.out_channels = in_channels, out_channels
        self.kernel = nn.Parameter(
            torch.empty(kernel_size ** 3, in_channels, out_channels))
        nn.init.normal_(self.kernel, 0, 0.05)
        self.bias = (nn.Parameter(torch.zeros(out_channels)) if bias
                     else None)

    def forward(self, x: SparseTensor) -> SparseTensor:
        s_in = x.tensor_stride[0]
        s_out = s_in // 2
        fine_coords, pairs, n_fine = x.kmaps[(s_out, s_in)]
        out = x.F.new_zeros(n_fine, self.out_channels)
        for ki, fine, coarse in pairs:
            out[fine] += x.F[coarse] @ self.kernel[ki]
        if self.bias is not None:
            out = out + self.bias
        return SparseTensor(out, fine_coords, s_out, dict(x.cmaps),
                            dict(x.kmaps))


class MinkowskiBatchNorm(nn.Module):
    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.bn = nn.BatchNorm1d(num_features, eps=eps, momentum=momentum)

    def forward(self, x):
        return x._like(self.bn(x.F))


class MinkowskiReLU(nn.Module):
    def __init__(self, inplace=False):
        super().__init__()

    def forward(self, x):
        return x._like(torch.relu(x.F))


def me_cat(*tensors):
    return tensors[0]._like(torch.cat([t.F for t in tensors], dim=1))


def install_me_stub():
    me = types.ModuleType("MinkowskiEngine")
    me.__path__ = []
    me.SparseTensor = SparseTensor
    me.TensorField = TensorField
    me.MinkowskiConvolution = MinkowskiConvolution
    me.MinkowskiConvolutionTranspose = MinkowskiConvolutionTranspose
    me.MinkowskiBatchNorm = MinkowskiBatchNorm
    me.MinkowskiReLU = MinkowskiReLU
    me.cat = me_cat
    me.SparseTensorQuantizationMode = types.SimpleNamespace(
        UNWEIGHTED_AVERAGE="unweighted_average")
    me.MinkowskiAlgorithm = types.SimpleNamespace(
        SPEED_OPTIMIZED="speed_optimized")
    utils = types.ModuleType("MinkowskiEngine.utils")
    utils.kaiming_normal_ = lambda t, **kw: t
    me.utils = utils
    sys.modules["MinkowskiEngine"] = me
    sys.modules["MinkowskiEngine.utils"] = utils
    for name in [n for n in sys.modules if n.startswith("pointcept.models")]:
        del sys.modules[name]
