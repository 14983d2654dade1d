"""Native C++ host ops vs their numpy/scipy references."""

import numpy as np
import pytest

from scenesplat_tpu import native
from scenesplat_tpu.data.transforms import fnv_hash_vec
from scenesplat_tpu.utils.misc import _majority_vote


def test_native_builds():
    assert native.available(), "g++ build of host_ops.cpp failed"


def test_fnv_hash_matches(rng):
    arr = rng.integers(0, 5000, (3000, 3)).astype(np.int64)
    np.testing.assert_array_equal(native.fnv_hash_rows(arr), fnv_hash_vec(arr))


def test_grid_sample_train(rng):
    gc = rng.integers(0, 20, (5000, 3)).astype(np.int32)
    idx, cell = native.grid_sample_train(gc, seed=3)
    uniq = np.unique(gc, axis=0)
    assert idx.shape[0] == uniq.shape[0]
    # each selected point is in a distinct voxel
    sel = gc[idx]
    assert np.unique(sel, axis=0).shape[0] == idx.shape[0]
    # cell ids group points by voxel
    for c in np.unique(cell)[:20]:
        members = gc[cell == c]
        assert np.unique(members, axis=0).shape[0] == 1


def test_knn_matches_kdtree(rng):
    from scipy.spatial import cKDTree

    data = rng.uniform(0, 5, (4000, 3)).astype(np.float32)
    query = rng.uniform(0, 5, (500, 3)).astype(np.float32)
    k = 8
    got = native.knn(data, query, k)
    _, expected = cKDTree(data).query(query, k=k, workers=-1)
    # compare k-th distance (sets can differ on exact ties)
    def dists(idx):
        return np.linalg.norm(data[idx] - query[:, None], axis=-1)

    np.testing.assert_allclose(
        np.sort(dists(got), axis=1),
        np.sort(dists(expected.astype(np.int32)), axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_majority_vote_matches(rng):
    labels = rng.integers(-1, 6, (1000, 9)).astype(np.int32)
    got = native.majority_vote(labels, 6, -1)
    expected = _majority_vote(labels, 6, -1)
    # ties may break differently; verify both picks have max count
    for i in range(1000):
        row = labels[i][labels[i] != -1]
        if row.size == 0:
            assert got[i] == -1 and expected[i] == -1
            continue
        counts = np.bincount(row, minlength=6)
        assert counts[got[i]] == counts.max()
        assert counts[expected[i]] == counts.max()
