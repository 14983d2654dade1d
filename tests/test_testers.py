"""ClsVotingTester / PartSegTester / submission writers."""

import os

import numpy as np

from scenesplat_tpu.engines.test import TESTERS, _write_submission


class _StubExtractor:
    """Returns precomputed per-sample logits keyed by sample['_id']."""

    def __init__(self, table):
        self.table = table

    def __call__(self, variables, sample):
        return self.table[int(sample["_id"])]


def _make_tester(cls_name, dataset, extractor, **kw):
    t = TESTERS.get(cls_name).__new__(TESTERS.get(cls_name))
    # bypass TesterBase.__init__ (builds real models); set protocol attrs
    t.dataset = dataset
    t.extractor = extractor
    t.variables = {}
    t.seed = 0
    import logging

    t.logger = logging.getLogger("test")
    for k, v in kw.items():
        setattr(t, k, v)
    return t


def test_cls_voting_tester_accumulates():
    # scene 0: true class 1, noisy per-repeat logits that average correctly
    rng = np.random.default_rng(0)
    base = np.array([[0.2, 1.0, 0.1], [1.5, 0.2, 0.1]], np.float32)
    dataset = [dict(_id=i, category=np.array([t])) for i, t in enumerate([1, 0])]

    class Ext:
        def __call__(self, variables, sample):
            i = int(sample["_id"])
            return base[i] + rng.normal(0, 0.5, 3).astype(np.float32)

    t = _make_tester(
        "ClsVotingTester", dataset, Ext(), num_classes=3, num_repeat=20,
        metric="allAcc", max_scenes=None,
    )
    best = t.test()
    assert best["allAcc"] == 1.0


def test_part_seg_tester():
    # one airplane with parts {0,1}, one car with parts {2,3}
    class DS(list):
        categories = ["airplane", "car"]
        category2part = {"airplane": [0, 1], "car": [2, 3]}

    n = 40
    seg_a = np.array([0] * 20 + [1] * 20)
    seg_c = np.array([2] * 25 + [3] * 15)
    logits_a = np.eye(4)[seg_a] * 5.0
    logits_c = np.eye(4)[seg_c] * 5.0
    # car predictions half wrong on part 3
    logits_c[30:] = np.eye(4)[2] * 5.0
    ds = DS([
        dict(_id=0, segment=seg_a, cls_token=np.array([0])),
        dict(_id=1, segment=seg_c, cls_token=np.array([1])),
    ])
    t = _make_tester(
        "PartSegTester", ds, _StubExtractor({0: logits_a, 1: logits_c}),
        num_classes=4, max_scenes=None,
    )
    res = t.test()
    assert np.isclose(res["ins_mIoU"], (1.0 + (25 / 35 + 5 / 15) / 2) / 2, atol=1e-6)


def test_submission_writers(tmp_path):
    pred = np.array([0, 1, 2, 1], np.int32)
    _write_submission(str(tmp_path), "scene1", pred, "NuScenesDataset")
    out = np.fromfile(
        tmp_path / "submit" / "lidarseg" / "test" / "scene1_lidarseg.bin",
        dtype=np.uint8,
    )
    assert (out == pred + 1).all()

    _write_submission(
        str(tmp_path), "08_000123", pred, "SemanticKITTIDataset",
        learning_map_inv={0: 10, 1: 11, 2: 13},
    )
    out = np.fromfile(
        tmp_path / "submit" / "sequences" / "08" / "predictions" / "000123.label",
        dtype=np.uint32,
    )
    assert (out == np.array([10, 11, 13, 11])).all()
