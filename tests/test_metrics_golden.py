"""Golden tests for eval metrics/voting vs reference pointcept/utils/misc.py
(the numba kernel runs un-jitted through the stubbed decorator)."""

import numpy as np
import pytest

from conftest import load_reference_package

from scenesplat_tpu.utils import misc as ours

_REF = load_reference_package("pointcept.utils.misc")
pytestmark = pytest.mark.skipif(
    _REF is None, reason="reference utils.misc unavailable"
)


def test_intersection_and_union_golden(rng):
    k = 7
    pred = rng.integers(0, k, 500).astype(np.int64)
    target = rng.integers(0, k, 500).astype(np.int64)
    target[rng.random(500) < 0.15] = -1
    ri, ru, rt = _REF.intersection_and_union(pred.copy(), target.copy(), k)
    oi, ou, ot = ours.intersection_and_union(pred.copy(), target.copy(), k)
    np.testing.assert_array_equal(oi, ri)
    np.testing.assert_array_equal(ou, ru)
    np.testing.assert_array_equal(ot, rt)


def test_neighbor_voting_golden(rng):
    n, k, classes = 400, 7, 5
    coord = rng.normal(size=(n, 3)).astype(np.float32) * 3
    pred = rng.integers(0, classes, n).astype(np.int64)
    valid = rng.random(n) > 0.3
    want = _REF.neighbor_voting(
        coord, pred, vote_k=k, ignore_label=-1, num_classes=classes,
        valid_mask=valid,
    )
    got = ours.neighbor_voting(
        coord, pred, vote_k=k, valid_mask=valid, num_classes=classes,
        ignore_index=-1,
    )
    # continuous random coords: kNN ties are measure-zero, results exact
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_clustering_voting_golden(seed):
    # independent rng per case: small dense instances make ignore-label
    # majorities common, covering the instance-becomes-ignore path
    r = np.random.default_rng(seed)
    n, classes = 300, 6
    pred = r.integers(0, classes, n).astype(np.int64)
    pred[r.random(n) < 0.3] = -1
    inst = r.integers(-1, 12, n).astype(np.int64)
    want = _REF.clustering_voting(pred.copy(), inst.copy(), -1)
    got = ours.clustering_voting(pred.copy(), inst.copy(), -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
