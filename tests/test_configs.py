"""Every shipped config must parse, build its model/criteria, and compose its
transform pipelines (reference ships 15 configs under configs/;
SURVEY.md §2 layer 6)."""

import glob
import os

import pytest

from scenesplat_tpu.data.transforms import Compose
from scenesplat_tpu.models import build_criteria, build_model
from scenesplat_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = [
    f for f in sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.py"),
                                recursive=True))
    if os.sep + "_base_" + os.sep not in f
]


def _check_dataset_cfg(d):
    if d is None:
        return
    if isinstance(d, (list, tuple)):
        for x in d:
            _check_dataset_cfg(x)
        return
    if d.get("type") == "ConcatDataset":
        for x in d["datasets"]:
            _check_dataset_cfg(x)
        return
    Compose(d.get("transform"))
    tc = d.get("test_cfg")
    if tc:
        Compose(tc.get("post_transform"))
        for aug in tc.get("aug_transform", []):
            Compose(aug)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(f, REPO)
                                               for f in CONFIGS])
def test_config_builds(path):
    cfg = Config.fromfile(path)
    model_cfg = cfg.get("model")
    if model_cfg is not None:
        if model_cfg["type"] != "DefaultContrastiverSimDinoV2":
            # SSL wrapper construction is exercised via the pretrainer
            # (tests/test_ssl.py); other models build directly.
            build_model({k: v for k, v in dict(model_cfg).items()
                         if k != "criteria"})
        if "criteria" in model_cfg:
            build_criteria(model_cfg["criteria"])
    if "data" in cfg:
        for split in ("train", "val", "test"):
            _check_dataset_cfg(cfg.data.get(split))
    # hooks/testers must name registered types
    from scenesplat_tpu.engines.hooks import HOOKS
    for h in cfg.get("hooks", []):
        assert h["type"] in HOOKS, h["type"]
