"""Golden test: ScanNet-protocol instance-seg AP vs the reference
InsSegEvaluator (pointcept/engines/hooks/evaluator.py:250-546)."""

from types import SimpleNamespace

import numpy as np
import pytest

from conftest import load_reference_package

from scenesplat_tpu.utils import insseg_eval as ours

_EV = load_reference_package("pointcept.engines.hooks.evaluator")
pytestmark = pytest.mark.skipif(
    _EV is None, reason="reference evaluator unavailable"
)

NUM_CLASSES = 4
IGNORE = (-1, 0)
NAMES = ["wall", "chair", "table", "sofa"]


def _random_scene(rng, n=2000, n_gt=6, n_pred=9):
    segment = rng.integers(-1, NUM_CLASSES, n).astype(np.int64)
    instance = np.full(n, -1, np.int64)
    start = 0
    for gid in range(n_gt):
        size = int(rng.integers(120, 300))
        cls = int(rng.integers(1, NUM_CLASSES))
        segment[start : start + size] = cls
        instance[start : start + size] = gid
        start += size
    pred_masks = np.zeros((n_pred, n), bool)
    pred_classes = rng.integers(1, NUM_CLASSES, n_pred).astype(np.int64)
    pred_scores = rng.random(n_pred).astype(np.float64)
    for pid in range(n_pred):
        if pid < n_gt and rng.random() < 0.7:
            # noisy copy of a GT instance
            m = instance == pid
            noise = rng.random(n) < 0.05
            pred_masks[pid] = m ^ (noise & (rng.random(n) < 0.5))
            if rng.random() < 0.8:
                pred_classes[pid] = segment[np.nonzero(m)[0][0]]
        else:
            lo = int(rng.integers(0, n - 300))
            pred_masks[pid, lo : lo + int(rng.integers(100, 280))] = True
    return segment, instance, pred_masks, pred_classes, pred_scores


def test_insseg_ap_golden(rng):
    import torch

    ref = _EV.InsSegEvaluator.__new__(_EV.InsSegEvaluator)
    _EV.InsSegEvaluator.__init__(ref, segment_ignore_index=IGNORE,
                                 instance_ignore_index=-1)
    ref.valid_class_names = [
        NAMES[i] for i in range(NUM_CLASSES) if i not in IGNORE
    ]
    ref.trainer = SimpleNamespace(
        cfg=SimpleNamespace(
            data=SimpleNamespace(num_classes=NUM_CLASSES, names=NAMES)
        )
    )

    ref_scenes, our_scenes = [], []
    for s in range(3):
        segment, instance, masks, classes, scores = _random_scene(rng)
        pred = {
            "pred_masks": torch.tensor(masks),
            "pred_classes": torch.tensor(classes),
            "pred_scores": torch.tensor(scores),
        }
        gt_i, pred_i = ref.associate_instances(
            pred, torch.tensor(segment), torch.tensor(instance)
        )
        ref_scenes.append(dict(gt=gt_i, pred=pred_i))
        our_scenes.append(
            ours.associate_instances(
                masks, classes, scores, segment, instance,
                num_classes=NUM_CLASSES, segment_ignore_index=IGNORE,
            )
        )

    want = ref.evaluate_matches(ref_scenes)
    got = ours.evaluate_matches(
        our_scenes, num_classes=NUM_CLASSES, class_names=NAMES,
        segment_ignore_index=IGNORE,
    )
    np.testing.assert_allclose(got["all_ap"], want["all_ap"],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got["all_ap_50%"], want["all_ap_50%"],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got["all_ap_25%"], want["all_ap_25%"],
                               rtol=1e-6, atol=1e-9)
    for name in ref.valid_class_names:
        np.testing.assert_allclose(
            got["classes"][name]["ap"], want["classes"][name]["ap"],
            rtol=1e-6, atol=1e-9, err_msg=name,
        )
