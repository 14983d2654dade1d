"""scannet_pair generation: .sens decode, unprojection, overlap pairs."""

import importlib.util
import io
import struct
import zlib
from pathlib import Path

import numpy as np


def _load():
    spec = importlib.util.spec_from_file_location(
        "gen_pairs",
        Path(__file__).resolve().parents[1] / "scripts"
        / "generate_scannet_pairs.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_sens(path, poses, depths, intr, depth_shift=1000.0):
    """Assemble a ScanNet SensorData v4 stream."""
    from PIL import Image

    h, w = depths[0].shape
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"test"
        f.write(struct.pack("<Q", len(name)) + name)
        eye = np.eye(4, dtype=np.float32)
        f.write(intr.astype(np.float32).tobytes())   # intrinsic_color
        f.write(eye.tobytes())                       # extrinsic_color
        f.write(intr.astype(np.float32).tobytes())   # intrinsic_depth
        f.write(eye.tobytes())                       # extrinsic_depth
        f.write(struct.pack("<ii", 1, 2))            # jpeg, zlib_ushort
        f.write(struct.pack("<IIII", w, h, w, h))
        f.write(struct.pack("<f", depth_shift))
        f.write(struct.pack("<Q", len(poses)))
        for pose, depth in zip(poses, depths):
            f.write(pose.astype(np.float32).tobytes())
            f.write(struct.pack("<QQ", 0, 0))        # timestamps
            img = Image.fromarray(
                np.full((h, w, 3), 128, np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            cbytes = buf.getvalue()
            dbytes = zlib.compress(depth.astype("<u2").tobytes())
            f.write(struct.pack("<QQ", len(cbytes), len(dbytes)))
            f.write(cbytes)
            f.write(dbytes)


def test_pair_generation(tmp_path):
    gp = _load()
    h, w = 16, 20
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 10.0  # fx, fy
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    # frame 0 and 1: identical pose (full overlap); frame 2: far away
    p0 = np.eye(4, dtype=np.float32)
    p2 = np.eye(4, dtype=np.float32)
    p2[:3, 3] = [100.0, 0, 0]
    depth = np.full((h, w), 1500, np.uint16)  # 1.5 m everywhere
    scene = tmp_path / "scans" / "scene0001_00"
    scene.mkdir(parents=True)
    _write_sens(scene / "scene0001_00.sens", [p0, p0, p2],
                [depth, depth, depth], intr)

    out = gp.process_scene(scene / "scene0001_00.sens", tmp_path / "pairs",
                           frame_skip=1, voxel=0.05)
    import torch

    pcd0 = torch.load(Path(out) / "pcd" / "0.pth", weights_only=False)
    assert pcd0["coord"].shape == (h * w, 3)
    assert pcd0["color"].shape == (h * w, 3)
    # unprojection: center pixel maps to (bx, by, z) ~ (0, 0, 1.5)
    ci = (h // 2) * w + (w // 2)
    np.testing.assert_allclose(pcd0["coord"][ci], [0, 0, 1.5], atol=1e-5)

    gp.collect_pairs(tmp_path / "pairs", threshold=0.3)
    lines = (tmp_path / "pairs" / "overlap30.txt").read_text().splitlines()
    pairs = {tuple(ln.split()[:2]) for ln in lines}
    assert ("/scene0001_00/pcd/0.pth", "/scene0001_00/pcd/1.pth") in pairs
    # the distant frame overlaps nothing
    assert all("2.pth" not in a and "2.pth" not in b for a, b in pairs)


def test_overlap_ratio_math():
    gp = _load()
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (200, 3))
    assert gp.overlap_ratio(a, a.copy(), 0.05) == 1.0
    b = a + 50.0
    assert gp.overlap_ratio(a, b, 0.05) == 0.0
