"""ScanNet AP protocol: hand-checkable matching cases."""

import numpy as np

from scenesplat_tpu.utils.insseg_eval import (
    associate_instances,
    evaluate_matches,
)


def _scene(n=400, num_classes=3):
    """Two GT instances of class 2 (200 pts each); class 0 elsewhere."""
    segment = np.zeros(n, np.int32)
    instance = np.full(n, -1, np.int32)
    segment[:200] = 2
    instance[:200] = 0
    segment[200:400] = 2
    instance[200:400] = 1
    return segment, instance


def _pred(masks, classes, scores, n=400):
    pm = np.zeros((len(masks), n), bool)
    for i, (s, e) in enumerate(masks):
        pm[i, s:e] = True
    return pm, np.asarray(classes, np.int32), np.asarray(scores, np.float32)


def test_perfect_predictions_ap1():
    segment, instance = _scene()
    pm, pc, ps = _pred([(0, 200), (200, 400)], [2, 2], [0.9, 0.8])
    rec = associate_instances(pm, pc, ps, segment, instance, 3,
                              segment_ignore_index=(-1, 0))
    scores = evaluate_matches([rec], 3, ["bg", "wall", "chair"],
                              segment_ignore_index=(-1, 0))
    assert np.isclose(scores["all_ap_50%"], 1.0)
    assert np.isclose(scores["all_ap"], 1.0)
    assert np.isclose(scores["classes"]["chair"]["ap50%"], 1.0)


def test_half_overlap_matches_only_low_threshold():
    segment, instance = _scene()
    # pred covers half of gt0 and nothing else: IoU = 100/200 = 0.5
    pm, pc, ps = _pred([(0, 100)], [2], [0.9])
    rec = associate_instances(pm, pc, ps, segment, instance, 3,
                              segment_ignore_index=(-1, 0))
    scores = evaluate_matches([rec], 3, ["bg", "wall", "chair"],
                              segment_ignore_index=(-1, 0))
    # IoU 0.5 is not > 0.5, so AP50 = 0; at 0.25 it matches gt0 (gt1 is a
    # hard FN -> recall caps at 0.5)
    assert np.isclose(scores["all_ap_50%"], 0.0)
    assert scores["all_ap_25%"] > 0.0
    assert scores["all_ap_25%"] <= 0.5 + 1e-6


def test_duplicate_prediction_counts_fp():
    segment, instance = _scene()
    # both predictions cover gt0 well; the duplicate becomes an FP whose
    # confidence (0.85) sits above gt1's TP (0.8), denting the PR curve
    pm, pc, ps = _pred([(0, 200), (0, 190), (200, 400)], [2, 2, 2],
                       [0.9, 0.85, 0.8])
    rec = associate_instances(pm, pc, ps, segment, instance, 3,
                              segment_ignore_index=(-1, 0))
    scores = evaluate_matches([rec], 3, ["bg", "wall", "chair"],
                              segment_ignore_index=(-1, 0))
    perfect = evaluate_matches(
        [associate_instances(*_pred([(0, 200), (200, 400)], [2, 2], [0.9, 0.8]),
                             segment, instance, 3, segment_ignore_index=(-1, 0))],
        3, ["bg", "wall", "chair"], segment_ignore_index=(-1, 0))
    assert scores["all_ap_50%"] < perfect["all_ap_50%"]
    assert scores["all_ap_50%"] > 0.5


def test_void_covering_prediction_ignored():
    segment, instance = _scene()
    segment[380:400] = -1  # carve out a void region
    instance[380:400] = -1
    # a prediction fully inside void: ignored, not an FP
    pm, pc, ps = _pred([(0, 200), (200, 380), (380, 400)], [2, 2, 2],
                       [0.9, 0.8, 0.99])
    rec = associate_instances(pm, pc, ps, segment, instance, 3,
                              segment_ignore_index=(-1, 0),
                              min_region_size=10)
    scores = evaluate_matches([rec], 3, ["bg", "wall", "chair"],
                              segment_ignore_index=(-1, 0), min_region_size=10)
    assert np.isclose(scores["all_ap_50%"], 1.0)


def test_hook_registration():
    import scenesplat_tpu.engines.hooks.evaluator  # noqa: F401
    from scenesplat_tpu.engines.hooks.default import HOOKS

    assert "InsSegEvaluator" in HOOKS
    assert "ClsEvaluator" in HOOKS
