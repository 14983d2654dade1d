"""Multi-host eval sharding: per-rank partition + merged metrics == serial
(reference test.py:88-106,549-666; evaluator.py:845-851)."""

import numpy as np
import pytest

from scenesplat_tpu.engines.eval import ZeroShotMetric
from scenesplat_tpu.parallel.dist_eval import (
    allgather_pyobjects,
    allreduce_sum_arrays,
    partition_indices,
)


def test_partition_disjoint_cover():
    for world in (1, 2, 3, 8):
        shards = [partition_indices(13, r, world) for r in range(world)]
        flat = sorted(i for s in shards for i in s)
        assert flat == list(range(13))


def test_sharded_miou_equals_serial():
    rng = np.random.default_rng(11)
    names = [f"c{i}" for i in range(6)]
    scenes = [
        (
            rng.integers(-1, 6, size=200).astype(np.int32),  # pred (with ignore)
            rng.integers(0, 6, size=200).astype(np.int32),  # target
        )
        for _ in range(7)
    ]

    serial = ZeroShotMetric(names, ("c0",), -1)
    for p, t in scenes:
        serial.update(p, t)

    world = 3
    merged_i = merged_u = merged_t = 0.0
    for rank in range(world):
        m = ZeroShotMetric(names, ("c0",), -1)
        for i in partition_indices(len(scenes), rank, world):
            m.update(*scenes[i])
        merged_i = merged_i + m.intersection
        merged_u = merged_u + m.union
        merged_t = merged_t + m.target
    merged = ZeroShotMetric(names, ("c0",), -1)
    merged.intersection, merged.union, merged.target = (
        merged_i, merged_u, merged_t,
    )
    for k in ("mIoU", "fg_mIoU", "mAcc", "allAcc"):
        assert np.isclose(serial.results()[k], merged.results()[k])


def test_single_process_reductions_are_identity():
    x = (np.arange(4.0), 3, np.ones((2, 2)))
    out = allreduce_sum_arrays(x)
    assert np.array_equal(out[0], x[0]) and out[1] == 3
    objs = [{"a": np.arange(3)}, "rec"]
    assert allgather_pyobjects(objs) == objs or (
        len(allgather_pyobjects(objs)) == 2
    )


def test_tester_visits_only_its_shard(monkeypatch, tmp_path):
    """A rank-1-of-2 ZeroShotSemSegTester touches exactly scenes 1, 3, ..."""
    from tests.test_testers import _StubExtractor, _make_tester

    n, c, d = 16, 4, 8
    rng = np.random.default_rng(5)
    text = rng.normal(size=(c, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    seen = []

    class Ext(_StubExtractor):
        def __call__(self, variables, sample):
            seen.append(int(sample["_id"]))
            return super().__call__(variables, sample)

    scenes, table = [], {}
    for i in range(4):
        seg = rng.integers(0, c, size=n).astype(np.int32)
        table[i] = text[seg] + rng.normal(0, 0.05, (n, d)).astype(np.float32)
        scenes.append(dict(
            name=f"s{i}", segment=seg, coord=rng.normal(size=(n, 3)),
            fragment_list=[dict(_id=i, index=np.arange(n))],
        ))
    monkeypatch.setenv("SCENESPLAT_EVAL_RANK", "1")
    monkeypatch.setenv("SCENESPLAT_EVAL_WORLD", "2")
    t = _make_tester(
        "ZeroShotSemSegTester", scenes, Ext(table),
        class_names=[f"c{i}" for i in range(c)], text_emb=text,
        excluded_classes=(), enable_voting=False, vote_k=3,
        confidence_threshold=0.0, ignore_index=-1, pred_label_mapping=None,
        top3=False, save_feat=False, skip_eval=False,
        save_path=None, save_submission=False, max_scenes=None, verbose=False,
    )
    t.test()
    assert sorted(seen) == [1, 3]
