"""Executable CPU stand-ins for ``ocnn`` (octree-nn) and ``dwconv`` — the
OctFormer dependency stack (reference octformer_v1m1_base.py:14-28) — so the
full torch reference model can run for golden tests. Same playbook as
tests/ts_stub.py (torchsparse), me_stub.py (MinkowskiEngine), tp3d_stub.py
(torch_points3d).

Reimplements the library SEMANTICS the reference relies on:

  - ``Points`` / ``Octree.build_octree``: points live in [-1, 1]; leaf cell
    = floor((p + 1) * 2^(depth-1)); the shuffled key interleaves bits with
    x most significant per triple (bit i of x -> key bit 3i+2 — identical
    to this repo's z-order, ops/bitops.interleave3_pair) and the batch index
    rides the high bits (b << 48). Per-leaf features/normals are averaged
    over the points sharing the leaf. Non-empty octants at each depth are
    the sorted unique key prefixes; with ``nempty=True`` (OctFormer's mode)
    features only ever live on non-empty octants, so empty siblings never
    materialize here.
  - ``OctreeConv`` kernel [3] stride 1: 27-tap conv over non-empty
    neighbors (missing/empty -> zero), x-major offset order (-1..1)^3 —
    the same enumeration as ops/subm_conv.kernel_offsets.
  - ``OctreeConv`` kernel [2] stride 2: 8 child taps indexed
    (x&1)<<2 | (y&1)<<1 | (z&1), summed into the non-empty parent.
  - ``OctreeDeconv`` kernel [3] stride 2: the adjoint of the
    corner-anchored k3s2 conv — child c receives
    sum_{p: c - 2p in (-1..1)^3} W[c - 2p]^T x[p].
    NOTE: real ocnn's stencil anchoring for strided k3 convs is not
    verifiable offline; this convention is the documented spec both sides
    of the golden implement (PARITY.md caveat, same class as spconv KRSC).
  - ``OctreeUpsample('nearest')`` / ``OctreeInterp('nearest')``: child
    takes its ancestor's value; query points take their leaf octant's.
  - ``OctreeDropPath``: identity in eval (goldens run eval-mode).
  - conv weights are stored [kdim, Cin, Cout] (dwconv: [kdim, C]).
  - ocnn.modules.OctreeConvBnRelu/OctreeDeconvBnRelu: conv(use_bias=False)
    + BatchNorm1d(eps=1e-5, momentum=0.01) + ReLU (ocnn modules convention;
    the reference's raw torch.nn.BatchNorm1d sites keep momentum 0.1).
"""

import itertools
import sys
import types

import numpy as np
import torch


def xyz2key(x, y, z, b=None, depth=16):
    key = torch.zeros_like(x.long())
    x, y, z = x.long(), y.long(), z.long()
    for i in range(depth):
        m = 1 << i
        key |= ((x & m) << (2 * i + 2)) | ((y & m) << (2 * i + 1)) | (
            (z & m) << (2 * i))
    if b is not None:
        key |= b.long() << 48
    return key


def key2xyz(key, depth=16):
    key = key.long()
    b = key >> 48
    x = torch.zeros_like(key)
    y = torch.zeros_like(key)
    z = torch.zeros_like(key)
    for i in range(depth):
        x |= ((key >> (3 * i + 2)) & 1) << i
        y |= ((key >> (3 * i + 1)) & 1) << i
        z |= ((key >> (3 * i + 0)) & 1) << i
    return x.int(), y.int(), z.int(), b.int()


class Points:
    def __init__(self, points, normals=None, features=None, labels=None,
                 batch_id=None, batch_size=1):
        self.points = points
        self.normals = normals
        self.features = features
        self.labels = labels
        self.batch_id = (batch_id if batch_id is not None
                         else torch.zeros(len(points), 1))
        self.batch_size = batch_size


class Octree:
    def __init__(self, depth, full_depth=2, batch_size=1, device=None,
                 **kwargs):
        self.depth = depth
        self.full_depth = full_depth
        self.batch_size = batch_size
        self.device = device
        num = depth + 1
        self._keys = [None] * num       # non-empty octant keys, sorted
        self._xyzb = [None] * num       # decoded (x, y, z, b) per octant
        self.features = [None] * num
        self.normals = [None] * num
        self.points = [None] * num
        self.nnum = torch.zeros(num, dtype=torch.int64)
        self.nnum_nempty = torch.zeros(num, dtype=torch.int64)

    # -- construction --------------------------------------------------
    def build_octree(self, point: Points):
        d = self.depth
        p = point.points
        scale = float(1 << (d - 1))
        cell = torch.floor((p + 1.0) * scale).long()
        cell = cell.clamp(0, (1 << d) - 1)
        b = point.batch_id.reshape(-1)
        leaf_key = xyz2key(cell[:, 0], cell[:, 1], cell[:, 2], b, d)
        uniq, inv = torch.unique(leaf_key, sorted=True, return_inverse=True)
        self._point_leaf_inv = inv  # original point -> leaf octant row
        self._keys[d] = uniq
        self.nnum_nempty[d] = len(uniq)

        def avg(values):
            out = torch.zeros(len(uniq), values.shape[1], dtype=values.dtype)
            cnt = torch.zeros(len(uniq), 1, dtype=values.dtype)
            out.index_add_(0, inv, values)
            cnt.index_add_(0, inv, torch.ones(len(values), 1,
                                              dtype=values.dtype))
            return out / cnt.clamp(min=1)

        if point.features is not None:
            self.features[d] = avg(point.features)
        if point.normals is not None:
            self.normals[d] = avg(point.normals)
        self.points[d] = avg(p)
        # coarser levels: unique parents of the non-empty set; count ALL
        # children of non-empty parents for nnum (dense through full_depth)
        keys = uniq
        for dd in range(d - 1, -1, -1):
            # strip batch bits, shift, re-add
            bb = keys >> 48
            geo = (keys & ((1 << 48) - 1)) >> 3
            keys = torch.unique(geo | (bb << 48), sorted=True)
            self._keys[dd] = keys
            self.nnum_nempty[dd] = len(keys)
        for dd in range(self.depth + 1):
            if dd <= self.full_depth:
                self.nnum[dd] = self.batch_size * (1 << (3 * dd))
            else:
                self.nnum[dd] = 8 * self.nnum_nempty[dd - 1]
        for dd in range(self.depth + 1):
            k = self._keys[dd]
            x, y, z, bb = key2xyz(k, dd)
            self._xyzb[dd] = (x, y, z, bb)

    def construct_all_neigh(self):
        pass  # neighbor lookups are done on the fly from keys

    # -- accessors (ocnn API) -------------------------------------------
    def key(self, depth, nempty=True):
        assert nempty, "stub tracks non-empty octants only"
        return self._keys[depth]

    def batch_id(self, depth, nempty=True):
        assert nempty
        return (self._keys[depth] >> 48).long()

    def xyzb(self, depth):
        return self._xyzb[depth]

    def lookup(self, depth, query_keys):
        """Index of each query key among depth's non-empty octants, -1 if
        absent."""
        keys = self._keys[depth]
        pos = torch.searchsorted(keys, query_keys)
        pos = pos.clamp(max=len(keys) - 1)
        ok = keys[pos] == query_keys
        return torch.where(ok, pos, torch.full_like(pos, -1))


def _gather_or_zero(x, idx):
    safe = idx.clamp(min=0)
    out = x[safe]
    out[idx < 0] = 0
    return out


class OctreeConv(torch.nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=(3,), stride=1,
                 nempty=True, use_bias=False, **kwargs):
        super().__init__()
        assert nempty
        k = kernel_size[0] if isinstance(kernel_size, (list, tuple)) \
            else kernel_size
        self.k = int(k)
        self.stride = stride
        assert (self.k, stride) in ((3, 1), (2, 2), (3, 2))
        kdim = {3: 27, 2: 8}[self.k]
        self.weights = torch.nn.Parameter(
            torch.randn(kdim, in_channels, out_channels) * 0.02)
        self.bias = (torch.nn.Parameter(torch.zeros(out_channels))
                     if use_bias else None)

    def forward(self, x, octree: Octree, depth: int):
        if self.k == 3 and self.stride == 1:
            out = _conv_k3s1(x, octree, depth, self.weights)
        elif self.k == 2 and self.stride == 2:
            out = _conv_k2s2(x, octree, depth, self.weights)
        else:  # (3, 2)
            out = _conv_k3s2(x, octree, depth, self.weights)
        if self.bias is not None:
            out = out + self.bias
        return out


def _conv_k3s1(x, octree, depth, weights):
    xq, yq, zq, bq = octree.xyzb(depth)
    n = len(xq)
    out = torch.zeros(n, weights.shape[2], dtype=x.dtype)
    lim = (1 << depth) - 1
    for t, (dx, dy, dz) in enumerate(
            itertools.product((-1, 0, 1), repeat=3)):
        nx, ny, nz = xq + dx, yq + dy, zq + dz
        inside = ((nx >= 0) & (nx <= lim) & (ny >= 0) & (ny <= lim)
                  & (nz >= 0) & (nz <= lim))
        qk = xyz2key(nx.clamp(0, lim), ny.clamp(0, lim), nz.clamp(0, lim),
                     bq, depth)
        idx = octree.lookup(depth, qk)
        idx = torch.where(inside, idx, torch.full_like(idx, -1))
        out += _gather_or_zero(x, idx) @ weights[t]
    return out


def _conv_k2s2(x, octree, depth, weights):
    """Children (depth) -> non-empty parents (depth-1); tap by child pos."""
    xq, yq, zq, bq = octree.xyzb(depth)
    tap = ((xq.long() & 1) << 2) | ((yq.long() & 1) << 1) | (zq.long() & 1)
    bb = octree._keys[depth] >> 48
    geo = (octree._keys[depth] & ((1 << 48) - 1)) >> 3
    parent_idx = octree.lookup(depth - 1, geo | (bb << 48))
    m = octree.nnum_nempty[depth - 1]
    out = torch.zeros(int(m), weights.shape[2], dtype=x.dtype)
    contrib = torch.einsum("nc,ncd->nd", x,
                           weights[tap].to(x.dtype))
    out.index_add_(0, parent_idx.long(), contrib)
    return out


def _conv_k3s2(x, octree, depth, weights):
    """Corner-anchored k3s2: parent p at depth-1 gathers fine octants at
    2p + (-1..1)^3 (depth). Output on non-empty parents."""
    xp, yp, zp, bp = octree.xyzb(depth - 1)
    m = len(xp)
    out = torch.zeros(m, weights.shape[2], dtype=x.dtype)
    lim = (1 << depth) - 1
    for t, (dx, dy, dz) in enumerate(
            itertools.product((-1, 0, 1), repeat=3)):
        nx = (xp.long() * 2 + dx)
        ny = (yp.long() * 2 + dy)
        nz = (zp.long() * 2 + dz)
        inside = ((nx >= 0) & (nx <= lim) & (ny >= 0) & (ny <= lim)
                  & (nz >= 0) & (nz <= lim))
        qk = xyz2key(nx.clamp(0, lim).int(), ny.clamp(0, lim).int(),
                     nz.clamp(0, lim).int(), bp, depth)
        idx = octree.lookup(depth, qk)
        idx = torch.where(inside, idx, torch.full_like(idx, -1))
        out += _gather_or_zero(x, idx) @ weights[t]
    return out


class OctreeDeconv(torch.nn.Module):
    """Adjoint of the corresponding strided OctreeConv."""

    def __init__(self, in_channels, out_channels, kernel_size=(3,), stride=2,
                 nempty=True, use_bias=False, **kwargs):
        super().__init__()
        assert nempty and stride == 2
        k = kernel_size[0] if isinstance(kernel_size, (list, tuple)) \
            else kernel_size
        self.k = int(k)
        kdim = {3: 27, 2: 8}[self.k]
        self.weights = torch.nn.Parameter(
            torch.randn(kdim, in_channels, out_channels) * 0.02)
        self.bias = (torch.nn.Parameter(torch.zeros(out_channels))
                     if use_bias else None)

    def forward(self, x, octree: Octree, depth: int):
        # input at depth (coarse), output at depth+1 non-empty octants
        xc, yc, zc, bc = octree.xyzb(depth + 1)
        n = len(xc)
        out = torch.zeros(n, self.weights.shape[2], dtype=x.dtype)
        offsets = (itertools.product((-1, 0, 1), repeat=3) if self.k == 3
                   else itertools.product((0,), repeat=3))
        lim = (1 << depth) - 1
        for t, (dx, dy, dz) in enumerate(offsets):
            if self.k == 2:
                # k2s2 deconv: child takes W[childpos]^T x[parent]
                raise NotImplementedError
            # child c receives from parent p iff c - 2p == (dx,dy,dz)
            px = (xc.long() - dx)
            py = (yc.long() - dy)
            pz = (zc.long() - dz)
            ok = ((px & 1) == 0) & ((py & 1) == 0) & ((pz & 1) == 0)
            px, py, pz = px >> 1, py >> 1, pz >> 1
            inside = ((px >= 0) & (px <= lim) & (py >= 0) & (py <= lim)
                      & (pz >= 0) & (pz <= lim)) & ok
            qk = xyz2key(px.clamp(0, lim).int(), py.clamp(0, lim).int(),
                         pz.clamp(0, lim).int(), bc, depth)
            idx = octree.lookup(depth, qk)
            idx = torch.where(inside, idx, torch.full_like(idx, -1))
            out += _gather_or_zero(x, idx) @ self.weights[t]
        if self.bias is not None:
            out = out + self.bias
        return out


class OctreeUpsample(torch.nn.Module):
    def __init__(self, method="nearest", nempty=True):
        super().__init__()
        assert method == "nearest" and nempty

    def forward(self, x, octree: Octree, depth, depth_out=None):
        if depth_out is None:
            depth_out = depth + 1
        out = x
        for dd in range(depth, depth_out):
            keys = octree._keys[dd + 1]
            bb = keys >> 48
            geo = (keys & ((1 << 48) - 1)) >> 3
            pidx = octree.lookup(dd, geo | (bb << 48))
            out = out[pidx.long()]
        return out


class OctreeInterp(torch.nn.Module):
    def __init__(self, method="nearest", nempty=True):
        super().__init__()
        assert method == "nearest" and nempty

    def forward(self, x, octree: Octree, depth, pts):
        p, b = pts[:, :3], pts[:, 3]
        scale = float(1 << (depth - 1))
        cell = torch.floor((p + 1.0) * scale).long().clamp(
            0, (1 << depth) - 1)
        qk = xyz2key(cell[:, 0], cell[:, 1], cell[:, 2], b, depth)
        idx = octree.lookup(depth, qk)
        return _gather_or_zero(x, idx)


class OctreeDropPath(torch.nn.Module):
    def __init__(self, drop_prob=0.0, nempty=True, **kwargs):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x, octree=None, depth=None):
        if not self.training or self.drop_prob <= 0.0:
            return x
        raise NotImplementedError("goldens run eval-mode")


class _ConvBnReluBase(torch.nn.Module):
    conv_cls = None

    def __init__(self, in_channels, out_channels, kernel_size=(3,), stride=1,
                 nempty=True, **kwargs):
        super().__init__()
        self.conv = self.conv_cls(in_channels, out_channels, kernel_size,
                                  stride, nempty, use_bias=False)
        # ocnn.modules convention: eps 1e-5, momentum 0.01
        self.bn = torch.nn.BatchNorm1d(out_channels, eps=1e-5, momentum=0.01)
        self.relu = torch.nn.ReLU(inplace=True)

    def forward(self, data, octree, depth):
        return self.relu(self.bn(self.conv(data, octree, depth)))


class OctreeConvBnRelu(_ConvBnReluBase):
    conv_cls = OctreeConv


class OctreeDeconvBnRelu(_ConvBnReluBase):
    conv_cls = OctreeDeconv

    def __init__(self, in_channels, out_channels, kernel_size=(3,), stride=2,
                 nempty=True, **kwargs):
        super().__init__(in_channels, out_channels, kernel_size, stride,
                         nempty, **kwargs)


class OctreeDWConv(torch.nn.Module):
    """dwconv.OctreeDWConv: depthwise 27-tap conv, weight [27, C]."""

    def __init__(self, channels, kernel_size=(3,), nempty=True,
                 use_bias=False, **kwargs):
        super().__init__()
        assert not use_bias
        self.weights = torch.nn.Parameter(torch.randn(27, channels) * 0.02)

    def forward(self, x, octree: Octree, depth: int):
        xq, yq, zq, bq = octree.xyzb(depth)
        out = torch.zeros_like(x)
        lim = (1 << depth) - 1
        for t, (dx, dy, dz) in enumerate(
                itertools.product((-1, 0, 1), repeat=3)):
            nx, ny, nz = xq + dx, yq + dy, zq + dz
            inside = ((nx >= 0) & (nx <= lim) & (ny >= 0) & (ny <= lim)
                      & (nz >= 0) & (nz <= lim))
            qk = xyz2key(nx.clamp(0, lim), ny.clamp(0, lim),
                         nz.clamp(0, lim), bq, depth)
            idx = octree.lookup(depth, qk)
            idx = torch.where(inside, idx, torch.full_like(idx, -1))
            out += _gather_or_zero(x, idx) * self.weights[t]
        return out


def install_ocnn_stubs():
    """Install executable ``ocnn`` + ``dwconv`` modules into sys.modules.
    Call BEFORE load_reference_package."""
    ocnn = types.ModuleType("ocnn")
    ocnn.__path__ = []
    octree_mod = types.ModuleType("ocnn.octree")
    octree_mod.Octree = Octree
    octree_mod.Points = Points
    octree_mod.key2xyz = key2xyz
    octree_mod.xyz2key = xyz2key
    nn_mod = types.ModuleType("ocnn.nn")
    nn_mod.OctreeConv = OctreeConv
    nn_mod.OctreeDeconv = OctreeDeconv
    nn_mod.OctreeUpsample = OctreeUpsample
    nn_mod.OctreeInterp = OctreeInterp
    nn_mod.OctreeDropPath = OctreeDropPath
    modules_mod = types.ModuleType("ocnn.modules")
    modules_mod.OctreeConvBnRelu = OctreeConvBnRelu
    modules_mod.OctreeDeconvBnRelu = OctreeDeconvBnRelu
    ocnn.octree = octree_mod
    ocnn.nn = nn_mod
    ocnn.modules = modules_mod

    dw = types.ModuleType("dwconv")
    dw.OctreeDWConv = OctreeDWConv

    for name, mod in [("ocnn", ocnn), ("ocnn.octree", octree_mod),
                      ("ocnn.nn", nn_mod), ("ocnn.modules", modules_mod),
                      ("dwconv", dw)]:
        sys.modules[name] = mod

    # reference model modules cached against inert stubs must re-import
    for name in [n for n in sys.modules if n.startswith("pointcept.models")]:
        del sys.modules[name]
