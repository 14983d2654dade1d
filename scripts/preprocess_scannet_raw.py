"""Raw ScanNet v2 -> npy scene folders.

Counterpart of the reference preprocessor
(pointcept/datasets/preprocessing/scannet/preprocess_scannet.py): reads each
scan's `_vh_clean_2.ply` mesh, `.0.010000.segs.json` over-segmentation, and
`.aggregation.json` instance groups, maps raw category names through the
packaged scannetv2-labels tsv to ScanNet-20 (nyu40-id order) and ScanNet-200
train indices, and writes train/val/test/<scene>/{coord,color,normal,
segment20,segment200,instance}.npy.

Differences from the reference (behavior-preserving):
- no plyfile/pandas dependency — a minimal numpy PLY reader below;
- vertex normals via vectorized np.add.at (the reference loops faces in
  Python);
- split lists and the label tsv come packaged (scenesplat_tpu.data.metadata)
  instead of a meta_data directory next to the script.

Usage:
    python scripts/preprocess_scannet_raw.py \
        --dataset-root /data/scannet/scans --output-root /data/scannet_npy \
        [--no-normals] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scenesplat_tpu.data import metadata  # noqa: E402

IGNORE_INDEX = -1

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply_mesh(path):
    """Minimal PLY reader for ScanNet meshes: returns (vertex_array [N, P]
    float64, faces [F, 3] int). Handles binary_little_endian and ascii with
    a vertex element of scalar properties and a face list property."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", f"not a ply file: {path}"
        fmt = None
        elements = []  # (name, count, [(prop_dtype, prop_name)], list_info)
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unterminated ply header")
            tok = line.decode("ascii", "replace").strip().split()
            if not tok or tok[0] == "comment":
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                elements.append([tok[1], int(tok[2]), [], None])
            elif tok[0] == "property":
                if tok[1] == "list":
                    elements[-1][3] = (
                        _PLY_DTYPES[tok[2]], _PLY_DTYPES[tok[3]], tok[4]
                    )
                else:
                    elements[-1][2].append((tok[2], _PLY_DTYPES[tok[1]]))
            elif tok[0] == "end_header":
                break
        if fmt == "ascii":
            return _read_ply_ascii(f, elements)
        assert fmt == "binary_little_endian", f"unsupported ply format {fmt}"
        verts = faces = None
        for name, count, props, list_info in elements:
            if list_info is None:
                dt = np.dtype([(p, "<" + d) for p, d in props])
                data = np.frombuffer(f.read(dt.itemsize * count), dtype=dt)
                if name == "vertex":
                    verts = np.stack(
                        [data[p].astype(np.float64) for p, _ in props], 1
                    )
            else:
                cnt_dt, idx_dt, _ = list_info
                cnt_size = np.dtype(cnt_dt).itemsize
                idx_size = np.dtype(idx_dt).itemsize
                rows = []
                for _ in range(count):
                    (k,) = struct.unpack(
                        "<" + {1: "B", 2: "H", 4: "I"}[cnt_size],
                        f.read(cnt_size),
                    )
                    rows.append(np.frombuffer(
                        f.read(idx_size * k), dtype="<" + idx_dt
                    ))
                if name == "face":
                    faces = np.stack(rows, 0).astype(np.int64)
        return verts, faces


def _read_ply_ascii(f, elements):
    verts = faces = None
    for name, count, props, list_info in elements:
        rows = [f.readline().split() for _ in range(count)]
        if list_info is None:
            arr = np.asarray(rows, dtype=np.float64)
            if name == "vertex":
                verts = arr
        else:
            if name == "face":
                faces = np.asarray(
                    [r[1: 1 + int(r[0])] for r in rows], dtype=np.int64
                )
    return verts, faces


def vertex_normals(coord, faces):
    """Area-weighted vertex normals (reference vertex_normal, vectorized)."""
    v01 = coord[faces[:, 1]] - coord[faces[:, 0]]
    v02 = coord[faces[:, 2]] - coord[faces[:, 0]]
    fn = np.cross(v01, v02)  # length = 2 * area: weighting matches reference
    nv = np.zeros_like(coord)
    for k in range(3):
        np.add.at(nv, faces[:, k], fn)
    nv /= np.linalg.norm(nv, axis=1, keepdims=True) + 1e-8
    return nv


def _label_tables():
    """raw_category -> (scannet20 train index, scannet200 train index)."""
    nyu40 = metadata.scannet_raw_to_nyu40()
    raw_id = metadata.scannet_raw_to_id200()
    ids20 = list(metadata.scannet_class_ids(20))
    ids200 = list(metadata.scannet_class_ids(200))
    t20, t200 = {}, {}
    for cat, nid in nyu40.items():
        t20[cat] = ids20.index(nid) if nid in ids20 else IGNORE_INDEX
    for cat, rid in raw_id.items():
        t200[cat] = ids200.index(rid) if rid in ids200 else IGNORE_INDEX
    return t20, t200


def process_scene(scene_path, output_root, parse_normals=True,
                  train_scenes=None, val_scenes=None):
    scene_path = Path(scene_path)
    scene_id = scene_path.name
    train_scenes = (set(metadata.scene_split("scannetv2", "train"))
                    if train_scenes is None else set(train_scenes))
    val_scenes = (set(metadata.scene_split("scannetv2", "val"))
                  if val_scenes is None else set(val_scenes))
    split = ("train" if scene_id in train_scenes
             else "val" if scene_id in val_scenes else "test")
    out = Path(output_root) / split / scene_id

    verts, faces = read_ply_mesh(
        scene_path / f"{scene_id}_vh_clean_2.ply"
    )
    coord = verts[:, :3].astype(np.float32)
    save = dict(coord=coord, color=verts[:, 3:6].astype(np.uint8))
    if parse_normals:
        save["normal"] = vertex_normals(
            verts[:, :3], faces
        ).astype(np.float32)

    if split != "test":
        seg_indices = np.asarray(json.loads(
            (scene_path / f"{scene_id}_vh_clean_2.0.010000.segs.json")
            .read_text()
        )["segIndices"])
        groups = json.loads(
            (scene_path / f"{scene_id}.aggregation.json").read_text()
        )["segGroups"]
        t20, t200 = _label_tables()
        seg20 = np.full(len(coord), IGNORE_INDEX, dtype=np.int64)
        seg200 = np.full(len(coord), IGNORE_INDEX, dtype=np.int64)
        inst = np.full(len(coord), IGNORE_INDEX, dtype=np.int64)
        for g in groups:
            pidx = np.where(np.isin(seg_indices, np.asarray(g["segments"])))[0]
            seg20[pidx] = t20.get(g["label"], IGNORE_INDEX)
            seg200[pidx] = t200.get(g["label"], IGNORE_INDEX)
            inst[pidx] = g["id"]
        save["segment20"] = seg20
        save["segment200"] = seg200
        save["instance"] = inst

    out.mkdir(parents=True, exist_ok=True)
    for k, v in save.items():
        np.save(out / f"{k}.npy", v)
    return str(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset-root", required=True,
                    help="directory containing scene folders (scans/)")
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--no-normals", action="store_true")
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    args = ap.parse_args()
    scenes = sorted(
        p for p in Path(args.dataset_root).iterdir() if p.is_dir()
    )
    print(f"{len(scenes)} scenes")
    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        for done in ex.map(
            process_scene, scenes,
            [args.output_root] * len(scenes),
            [not args.no_normals] * len(scenes),
        ):
            print("done:", done)


if __name__ == "__main__":
    main()
