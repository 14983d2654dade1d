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


def test_top3_matches_torch_topk():
    """Golden: zero_shot_predict(top3=True) == pred.topk(3, dim=1)[1]
    (reference test.py:373-374)."""
    import torch

    from scenesplat_tpu.engines.eval import zero_shot_predict

    rng = np.random.default_rng(3)
    feat = rng.normal(size=(257, 16)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    text = rng.normal(size=(21, 16)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)

    pred, prob = zero_shot_predict(feat, text, confidence_threshold=0.5,
                                   top3=True)
    ref = torch.from_numpy(prob).topk(3, dim=1)[1].numpy()
    assert pred.shape == (257, 3)
    # float probs from a continuous draw: no ties, ordering is well-defined
    np.testing.assert_array_equal(pred, ref)


def test_zero_shot_tester_top3(tmp_path):
    """ScanNetPP protocol end-to-end: [N, 3] comma-delimited submission,
    metrics from the top-1 column (reference test.py:372-401)."""
    from scenesplat_tpu.engines.eval import ZeroShotMetric

    n, c, d = 64, 5, 8
    rng = np.random.default_rng(7)
    text = rng.normal(size=(c, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    segment = rng.integers(0, c, size=n).astype(np.int32)
    feat = text[segment] + rng.normal(0, 0.05, size=(n, d)).astype(np.float32)

    class ScanNetPPStub(list):
        pass

    frag = dict(_id=0, index=np.arange(n))
    scene = dict(
        name="sc0", segment=segment, coord=rng.normal(size=(n, 3)),
        fragment_list=[frag],
    )
    t = _make_tester(
        "ZeroShotSemSegTester", ScanNetPPStub([scene]),
        _StubExtractor({0: feat}),
        class_names=[f"c{i}" for i in range(c)], text_emb=text,
        excluded_classes=(), enable_voting=False, vote_k=3,
        confidence_threshold=0.9, ignore_index=-1, pred_label_mapping=None,
        top3=True, save_feat=False, skip_eval=False,
        save_path=str(tmp_path), save_submission=True, max_scenes=None,
        verbose=False,
    )
    res = t.test()
    sub = np.loadtxt(tmp_path / "submit" / "sc0.txt", delimiter=",",
                     dtype=np.int64)
    assert sub.shape == (n, 3)
    # the top-1 column IS the argmax — no confidence threshold on this path
    logits = feat @ text.T
    prob = 1.0 / (1.0 + np.exp(-logits))
    np.testing.assert_array_equal(sub[:, 0], prob.argmax(1))
    ref_metric = ZeroShotMetric([f"c{i}" for i in range(c)], (), -1)
    ref_metric.update(prob.argmax(1).astype(np.int32), segment)
    assert np.isclose(
        res["mIoU"], ref_metric.results(protocol="tester")["mIoU"]
    )
    # reference test.py:624: final metrics also land in eval_results.txt
    txt = (tmp_path / "eval_results.txt").read_text()
    assert f"{res['mIoU']:.4f}" in txt and "Per-class results:" in txt


def test_zero_shot_pred_cache_resume(tmp_path):
    """Saved {name}_pred.npy skips inference on rerun with identical
    metrics (reference test.py:272-288, 505)."""
    n, c, d = 48, 4, 8
    rng = np.random.default_rng(9)
    text = rng.normal(size=(c, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    seg = rng.integers(0, c, size=n).astype(np.int32)
    feat = text[seg] + rng.normal(0, 0.05, (n, d)).astype(np.float32)
    calls = []

    class Ext(_StubExtractor):
        def __call__(self, variables, sample):
            calls.append(1)
            return super().__call__(variables, sample)

    def make():
        scene = dict(name="sc", segment=seg, coord=rng.normal(size=(n, 3)),
                     fragment_list=[dict(_id=0, index=np.arange(n))])
        return _make_tester(
            "ZeroShotSemSegTester", [scene], Ext({0: feat}),
            class_names=[f"c{i}" for i in range(c)], text_emb=text,
            excluded_classes=(), enable_voting=False, vote_k=3,
            confidence_threshold=0.0, ignore_index=-1,
            pred_label_mapping=None, top3=False, save_feat=False,
            skip_eval=False, save_path=str(tmp_path),
            save_submission=False, max_scenes=None, verbose=False,
        )

    r1 = make().test()
    assert len(calls) == 1
    assert (tmp_path / "sc_pred.npy").exists()
    r2 = make().test()
    assert len(calls) == 1  # no new inference
    assert np.isclose(r1["mIoU"], r2["mIoU"])


def test_zero_shot_pred_cache_weights_fingerprint(tmp_path):
    """Cached predictions are invalidated when the weights fingerprint
    changes, and reused when it matches."""
    n, c, d = 48, 4, 8
    rng = np.random.default_rng(9)
    text = rng.normal(size=(c, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    seg = rng.integers(0, c, size=n).astype(np.int32)
    feat = text[seg] + rng.normal(0, 0.05, (n, d)).astype(np.float32)
    calls = []

    class Ext(_StubExtractor):
        def __call__(self, variables, sample):
            calls.append(1)
            return super().__call__(variables, sample)

    def make(fp):
        scene = dict(name="sc", segment=seg, coord=rng.normal(size=(n, 3)),
                     fragment_list=[dict(_id=0, index=np.arange(n))])
        return _make_tester(
            "ZeroShotSemSegTester", [scene], Ext({0: feat}),
            class_names=[f"c{i}" for i in range(c)], text_emb=text,
            excluded_classes=(), enable_voting=False, vote_k=3,
            confidence_threshold=0.0, ignore_index=-1,
            pred_label_mapping=None, top3=False, save_feat=False,
            skip_eval=False, save_path=str(tmp_path),
            save_submission=False, max_scenes=None, verbose=False,
            weights_fingerprint=fp,
        )

    make("ckptA:1").test()
    assert len(calls) == 1
    make("ckptA:1").test()
    assert len(calls) == 1  # same weights: cache reused
    make("ckptB:2").test()
    assert len(calls) == 2  # different weights: cache invalidated
    make("ckptB:2").test()
    assert len(calls) == 2  # re-stamped sidecar: cache valid again
