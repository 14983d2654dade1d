"""Generic 3DGS .ply -> per-scene .npy converter.

Counterpart of reference scripts/preprocess_gs.py:32-91: extracts per-Gaussian
attributes with the standard activations — sigmoid(opacity), exp(scale),
L2-normalized sign-fixed wxyz quaternion, SH-DC term -> RGB.

Usage:
    python scripts/preprocess_gs.py --input scenes/*.ply --output data/my_gs/train
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SH_C0 = 0.28209479177387814


def read_gaussian_ply(path: str) -> dict:
    try:
        from plyfile import PlyData

        vertex = PlyData.read(path)["vertex"]
        names = [p.name for p in vertex.properties]
        get = lambda n: np.asarray(vertex[n])
    except (ImportError, AttributeError, TypeError):
        # minimal binary_little_endian ply reader fallback. plyfile is
        # optional — and an INERT plyfile stub may occupy sys.modules (the
        # test suite stubs the reference repo's CUDA-adjacent deps), in
        # which case PlyData exists but has no working .read
        names, get = _read_ply_fallback(path)

    data = {}
    coord = np.stack(
        [get("x"), get("y"), get("z")], axis=-1
    ).astype(np.float32)
    data["coord"] = coord
    n = coord.shape[0]

    data["opacity"] = (1.0 / (1.0 + np.exp(-get("opacity").astype(np.float32))))

    scale_names = sorted(
        (nm for nm in names if nm.startswith("scale_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    data["scale"] = np.exp(
        np.stack([get(nm) for nm in scale_names], axis=-1).astype(np.float32)
    )

    rot_names = sorted(
        (nm for nm in names if nm.startswith("rot")),
        key=lambda s: int(s.split("_")[-1]),
    )
    quat = np.stack([get(nm) for nm in rot_names], axis=-1).astype(np.float32)
    quat = quat / (np.linalg.norm(quat, axis=1, keepdims=True) + 1e-9)
    quat = quat * np.sign(quat[:, :1])  # fix the sign ambiguity (w >= 0)
    data["quat"] = quat

    dc = np.stack([get(f"f_dc_{i}") for i in range(3)], axis=-1).astype(np.float32)
    color = np.clip(dc * SH_C0 + 0.5, 0, 1)
    data["color"] = (color * 255).astype(np.uint8)
    return data


def _read_ply_fallback(path):
    import struct

    with open(path, "rb") as f:
        props = []
        fmt_map = {"float": ("f", 4), "double": ("d", 8), "int": ("i", 4),
                   "uchar": ("B", 1)}
        n_vertex = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n_vertex = int(line.split()[-1])
            elif line.startswith("property"):
                _, ptype, pname = line.split()
                props.append((pname, *fmt_map[ptype]))
            elif line == "end_header":
                break
        fmt = "<" + "".join(p[1] for p in props)
        size = struct.calcsize(fmt)
        raw = np.frombuffer(f.read(n_vertex * size), dtype=np.dtype(
            [(p[0], "<" + p[1]) for p in props]
        ))
    names = [p[0] for p in props]
    return names, lambda n: np.asarray(raw[n])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", nargs="+", required=True, help=".ply files")
    parser.add_argument("--output", required=True, help="output split dir")
    args = parser.parse_args()
    for ply in args.input:
        name = os.path.splitext(os.path.basename(ply))[0]
        out_dir = os.path.join(args.output, name)
        os.makedirs(out_dir, exist_ok=True)
        data = read_gaussian_ply(ply)
        for key, value in data.items():
            np.save(os.path.join(out_dir, f"{key}.npy"), value)
        print(f"{name}: {data['coord'].shape[0]} gaussians -> {out_dir}")


if __name__ == "__main__":
    main()
