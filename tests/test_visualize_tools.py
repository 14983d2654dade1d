"""Smoke tests for the visualization CLIs (headless PLY backend)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("viz_scene")
    n = 300
    r = np.random.default_rng(0)
    np.save(d / "coord.npy", r.normal(size=(n, 3)).astype(np.float32))
    np.save(d / "color.npy", r.uniform(0, 255, (n, 3)).astype(np.float32))
    np.save(d / "opacity.npy", r.uniform(0, 1, (n, 1)).astype(np.float32))
    np.save(d / "quat.npy", r.normal(size=(n, 4)).astype(np.float32))
    np.save(d / "scale.npy", r.uniform(1e-3, 0.1, (n, 3)).astype(np.float32))
    np.save(d / "segment.npy", r.integers(0, 5, n).astype(np.int16))
    return str(d)


def _run(args, cwd):
    env = dict(os.environ, SCENESPLAT_PLATFORM="cpu",
               PYTHONPATH=os.getcwd() + ":" + os.environ.get("PYTHONPATH", ""))
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=300,
    )


def test_visualize_scene_ply(scene_dir, tmp_path):
    out = tmp_path / "viz" / "scene"
    res = _run(
        [os.path.abspath("tools/visualize_scene.py"), scene_dir,
         "--backend", "ply", "--mode", "both", "--out", str(out)],
        cwd=os.getcwd(),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    written = [l.split()[-1] for l in res.stdout.splitlines()
               if l.startswith("wrote ")]
    assert written, res.stdout
    for path in written:
        assert os.path.exists(path)
        assert os.path.getsize(path) > 100
