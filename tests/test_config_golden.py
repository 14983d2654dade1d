"""Golden test: our Config loader reproduces the reference mmcv-style Config
(_base_ list inheritance + deep merge) on the reference repo's OWN config
files. Configs the reference itself fails to parse (NameError /
FileNotFoundError defects in the repo) are skipped for both."""

import glob

import pytest

from conftest import load_reference_package

from scenesplat_tpu.utils.config import Config

_REF_CFG = load_reference_package("pointcept.utils.config")
pytestmark = pytest.mark.skipif(
    _REF_CFG is None, reason="reference config module unavailable"
)

_FILES = sorted(
    f
    for f in glob.glob("/root/reference/configs/**/*.py", recursive=True)
    if "_base_" not in f
)


def _norm(x):
    if isinstance(x, dict):
        return {k: _norm(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_norm(v) for v in x]
    return x


@pytest.mark.parametrize("path", _FILES, ids=lambda p: p.split("configs/")[-1])
def test_config_parse_golden(path):
    try:
        want = _norm(dict(_REF_CFG.Config.fromfile(path)))
    except Exception as e:
        pytest.skip(f"reference itself fails to parse: {type(e).__name__}")
    got = _norm(dict(Config.fromfile(path)))
    assert got == want
