"""Native host-ops bindings (ctypes) with numpy fallbacks.

Builds host_ops.cpp on first import (g++ -O3 -shared); every function
gracefully falls back to the numpy/scipy implementation when the toolchain or
the shared object is unavailable, so the framework works everywhere and is
fast where it can be.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhost_ops.so")
_LIB = None


def _build():
    src = os.path.join(_HERE, "host_ops.cpp")
    # compile to a unique temp path, then atomically rename: concurrent
    # processes (e.g. parallel pytest runs) must never mmap a half-written
    # .so, and a process already executing the old library keeps its mapping
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_HERE, "host_ops.cpp")
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.fnv_hash_rows.restype = None
        lib.grid_sample_train.restype = ctypes.c_int64
        lib.knn_grid.restype = None
        lib.majority_vote.restype = None
        lib.pointgroup_cluster.restype = ctypes.c_int64
        lib.subm_dense_plan.restype = None
        _LIB = lib
    except Exception:
        _LIB = False
    return _LIB


def available() -> bool:
    return bool(_load())


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def fnv_hash_rows(arr: np.ndarray) -> np.ndarray:
    lib = _load()
    arr64 = np.ascontiguousarray(arr, dtype=np.int64)
    if not lib:
        from scenesplat_tpu.data.transforms import fnv_hash_vec

        return fnv_hash_vec(arr64)
    out = np.empty(arr64.shape[0], np.uint64)
    lib.fnv_hash_rows(
        _ptr(arr64, ctypes.c_int64),
        ctypes.c_int64(arr64.shape[0]),
        ctypes.c_int64(arr64.shape[1]),
        _ptr(out, ctypes.c_uint64),
    )
    return out


def grid_sample_train(grid_coord: np.ndarray, seed: int = 0):
    """Returns (idx_unique, cell_of_point): one random point per voxel."""
    lib = _load()
    gc = np.ascontiguousarray(grid_coord, dtype=np.int32)
    n = gc.shape[0]
    if not lib:
        from scenesplat_tpu.data.transforms import fnv_hash_vec

        key = fnv_hash_vec(gc.astype(np.int64))
        order = np.argsort(key)
        _, inverse, counts = np.unique(
            key[order], return_inverse=True, return_counts=True
        )
        starts = np.cumsum(np.insert(counts, 0, 0))[:-1]
        rng = np.random.default_rng(seed)
        pick = starts + rng.integers(0, counts.max(), counts.size) % counts
        cell = np.zeros(n, np.int64)
        cell[order] = inverse
        return order[pick], cell
    idx = np.empty(n, np.int64)
    cell = np.empty(n, np.int64)
    m = lib.grid_sample_train(
        _ptr(gc, ctypes.c_int32), ctypes.c_int64(n),
        ctypes.c_uint64(seed),
        _ptr(idx, ctypes.c_int64), _ptr(cell, ctypes.c_int64),
    )
    return idx[:m].copy(), cell


def knn(data: np.ndarray, query: np.ndarray, k: int, cell: float | None = None):
    """k nearest data indices per query, [m, k] int32."""
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    k_eff = min(k, data.shape[0])
    if not lib:
        from scipy.spatial import cKDTree

        _, idx = cKDTree(data).query(query, k=k_eff, workers=-1)
        idx = np.atleast_2d(idx)
        if idx.ndim == 1:
            idx = idx[:, None]
        return idx.astype(np.int32)
    if cell is None:
        # aim for ~2k points per cell neighborhood
        span = np.ptp(data, axis=0).max() + 1e-6
        density = data.shape[0] / max(span**3, 1e-9)
        cell = float(max((max(k_eff, 8) / max(density, 1e-9)) ** (1 / 3), 1e-3))
    out = np.empty((query.shape[0], k_eff), np.int32)
    lib.knn_grid(
        _ptr(data, ctypes.c_float), ctypes.c_int64(data.shape[0]),
        _ptr(query, ctypes.c_float), ctypes.c_int64(query.shape[0]),
        ctypes.c_int64(k_eff), ctypes.c_float(cell),
        _ptr(out, ctypes.c_int32),
    )
    return out


def pointgroup_cluster(
    coord: np.ndarray, labels: np.ndarray, radius: float, min_points: int
):
    """Same-label radius-graph connected components (reference
    pointgroup_ops ballquery_batch_p + bfs_cluster,
    libs/pointgroup_ops/functions/functions.py:5-176). Returns
    (cluster_id [n] int32 with -1 for unclustered, num_clusters)."""
    lib = _load()
    coord = np.ascontiguousarray(coord, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    n = coord.shape[0]
    if n == 0:
        return np.empty(0, np.int32), 0
    if not lib:
        from scipy.spatial import cKDTree

        pairs = cKDTree(coord).query_pairs(radius, output_type="ndarray")
        parent = np.arange(n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            if labels[a] != labels[b]:
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        roots = np.array([find(i) for i in range(n)])
        uniq, counts = np.unique(roots, return_counts=True)
        keep = {r: i for i, r in enumerate(uniq[counts >= min_points])}
        out = np.array([keep.get(r, -1) for r in roots], np.int32)
        return out, len(keep)
    out = np.empty(n, np.int32)
    m = lib.pointgroup_cluster(
        _ptr(coord, ctypes.c_float), _ptr(labels, ctypes.c_int32),
        ctypes.c_int64(n), ctypes.c_float(radius),
        ctypes.c_int32(min_points), _ptr(out, ctypes.c_int32),
    )
    return out, int(m)


def majority_vote(labels: np.ndarray, num_classes: int, ignore_index: int = -1):
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int32)
    if not lib:
        from scenesplat_tpu.utils.misc import _majority_vote

        return _majority_vote(labels, num_classes, ignore_index)
    out = np.empty(labels.shape[0], np.int32)
    lib.majority_vote(
        _ptr(labels, ctypes.c_int32),
        ctypes.c_int64(labels.shape[0]), ctypes.c_int64(labels.shape[1]),
        ctypes.c_int32(num_classes), ctypes.c_int32(ignore_index),
        _ptr(out, ctypes.c_int32),
    )
    return out


def subm_dense_plan(
    grid_coord: np.ndarray, mask: np.ndarray, kernel_size: int,
    extent,
):
    """Host-built dense-grid submanifold conv plan.

    Returns (neighbor_index [n, k^3] int32, neighbor_valid [n, k^3] bool) —
    the exact output of the device builder
    (ops/subm_conv.py:build_subm_conv_plan_dense) in point-major layout.
    The plan is a pure function of grid_coord, so the data-loader workers
    build it here and ship it as a batch input, taking conv-plan
    construction off the device's critical path entirely (the reference
    pays the analogous spconv hash build on-GPU per forward,
    pointcept/models/utils/structure.py:104-140)."""
    lib = _load()
    gc = np.ascontiguousarray(grid_coord, np.int32)
    mk = np.ascontiguousarray(mask, bool)
    n = gc.shape[0]
    k = int(kernel_size)
    k3 = k ** 3
    ex, ey, ez = (int(e) for e in extent)
    if lib:
        out_nbr = np.empty((n, k3), np.int32)
        out_valid = np.empty((n, k3), np.uint8)
        lib.subm_dense_plan(
            _ptr(gc, ctypes.c_int32),
            _ptr(mk.view(np.uint8), ctypes.c_uint8),
            ctypes.c_int64(n),
            ctypes.c_int32(k), ctypes.c_int32(ex), ctypes.c_int32(ey),
            ctypes.c_int32(ez),
            _ptr(out_nbr, ctypes.c_int32),
            _ptr(out_valid, ctypes.c_uint8),
        )
        return out_nbr, out_valid.view(bool)
    # numpy fallback: same dense-grid structure, vectorized
    r = k // 2
    ezp = ez + 2 * r
    m = ex * ey * ezp
    x, y, z = gc[:, 0], gc[:, 1], gc[:, 2]
    in_extent = (
        (x >= 0) & (x < ex) & (y >= 0) & (y < ey) & (z >= 0) & (z < ez)
    )
    live = mk & in_extent
    grid = np.zeros(m, np.int32)
    flat = (x[live].astype(np.int64) * ey + y[live]) * ezp + z[live] + r
    grid[flat] = np.nonzero(live)[0].astype(np.int32) + 1
    zok = (z >= 0) & (z < ez)
    nbr = np.zeros((n, k3), np.int32)
    valid = np.zeros((n, k3), bool)
    dz = np.arange(k) - r
    for dxi, dx in enumerate(range(-r, r + 1)):
        qx = x + dx
        vx = (qx >= 0) & (qx < ex)
        cx = np.clip(qx, 0, ex - 1)
        for dyi, dy in enumerate(range(-r, r + 1)):
            qy = y + dy
            vy = vx & (qy >= 0) & (qy < ey)
            cy = np.clip(qy, 0, ey - 1)
            base = (cx.astype(np.int64) * ey + cy) * ezp + np.clip(z, 0, ez - 1)
            ids = grid[base[:, None] + np.arange(k)[None, :]]  # [n, k]
            qz = z[:, None] + dz[None, :]
            v = (
                (vy & zok & mk)[:, None]
                & (qz >= 0) & (qz < ez) & (ids > 0)
            )
            lo = (dxi * k + dyi) * k
            nbr[:, lo : lo + k] = np.where(v, np.maximum(ids - 1, 0), 0)
            valid[:, lo : lo + k] = v
    return nbr, valid
