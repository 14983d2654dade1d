"""Attach evaluation point-cloud labels to 3DGS scenes and chunks.

Counterpart of the reference's adding_pc_label_to_gs_chunk.py
(pointcept/datasets/preprocessing/adding_pc_label_to_gs_chunk.py): the GS
training data carries per-Gaussian features, but mIoU is reported on the
original (non-GS) point cloud — so every GS scene/chunk needs the slice of
the original cloud that lies near its Gaussians.

Two operations per dataset root:

1. scene-level splits (val/test by default): copy the original scene's
   coord.npy -> pc_coord.npy and every segment*.npy -> pc_segment*.npy
   (plus instance.npy -> pc_instance.npy when present).

2. chunked splits (*chunk* dirs, e.g. train_grid6x6): for each chunk, query
   the scene KD-tree with the chunk's Gaussian centroids (k neighbors,
   distance cap), keep the unique in-range point indices, and write the
   sliced pc_coord.npy / pc_segment*.npy. Optionally re-label the Gaussians
   themselves from their 1-NN point (--write-semseg-label), writing back
   any segment file whose name contains 'nyu' with -1 past the distance cap
   — the reference's semseg_label_slice behavior.

Usage:
    python scripts/add_pc_labels_to_chunks.py \
        --gs-root /data/scannet_mcmc_3dgs --pc-root /data/scannet_pc \
        [--k 16] [--dist-limit 0.25] [--write-semseg-label]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np
from scipy.spatial import cKDTree

SPLITS = ("train", "val", "test")


def _split_of(name: str) -> str:
    for s in SPLITS:
        if name.startswith(s):
            return s
    raise ValueError(f"cannot infer split from directory name {name!r}")


class SceneIndex:
    """One scene's coords + segment arrays + KD-tree, rebuilt on scene
    change (chunks of the same scene are processed consecutively)."""

    def __init__(self):
        self.name = None
        self.coords = None
        self.segments = {}
        self.tree = None

    def load(self, scene_dir: Path):
        if self.name == scene_dir.name:
            return
        self.coords = np.load(scene_dir / "coord.npy")
        self.tree = cKDTree(self.coords)
        self.segments = {
            p.name: np.load(p) for p in sorted(scene_dir.glob("segment*.npy"))
        }
        self.name = scene_dir.name

    def slice_near(self, xyz: np.ndarray, k: int, dist_limit: float):
        """Unique original-cloud points within dist_limit of any of the k
        nearest neighbors of each Gaussian centroid."""
        dists, idx = self.tree.query(xyz, k=k, workers=-1)
        keep = np.unique(idx[dists <= dist_limit])
        if keep.size == 0:
            return (np.empty((0, 3), np.float32),
                    {n: s[:0] for n, s in self.segments.items()})
        return (self.coords[keep],
                {n: s[keep] for n, s in self.segments.items()})

    def label_gaussians(self, xyz: np.ndarray, dist_limit: float):
        """1-NN label transfer onto the Gaussians; -1 past dist_limit."""
        dists, idx = self.tree.query(xyz, k=1, workers=-1)
        ok = dists <= dist_limit
        out = {}
        for name, seg in self.segments.items():
            lab = seg[idx].copy()
            lab[~ok] = -1
            out[name] = lab
        return out


def copy_scene_level(gs_root: Path, pc_root: Path, splits) -> None:
    for split in splits:
        gs_split = gs_root / split
        if not gs_split.is_dir():
            continue
        for scene_dir in sorted(p for p in gs_split.iterdir() if p.is_dir()):
            src = pc_root / split / scene_dir.name
            if not src.is_dir():
                print(f"warning: original scene missing: {src}",
                      file=sys.stderr)
                continue
            dst_coord = scene_dir / "pc_coord.npy"
            if not dst_coord.exists():
                shutil.copy2(src / "coord.npy", dst_coord)
            for seg in src.glob("segment*.npy"):
                dst = scene_dir / f"pc_{seg.name}"
                if not dst.exists():
                    shutil.copy2(seg, dst)
            inst = src / "instance.npy"
            if inst.exists() and not (scene_dir / "pc_instance.npy").exists():
                shutil.copy2(inst, scene_dir / "pc_instance.npy")
            print(f"[{split}] {scene_dir.name}: scene-level labels copied")


def process_chunks(gs_root: Path, pc_root: Path, k: int, dist_limit: float,
                   write_semseg_label: bool) -> None:
    cache = SceneIndex()
    chunk_roots = sorted(
        d for d in gs_root.iterdir()
        if d.is_dir() and "chunk" in d.name and "filtered" not in d.name
    )
    for subdir in chunk_roots:
        split = _split_of(subdir.name)
        for chunk_dir in sorted(p for p in subdir.iterdir() if p.is_dir()):
            scene_name = chunk_dir.name.rsplit("_", 1)[0]
            src_scene = pc_root / split / scene_name
            if not src_scene.is_dir():
                print(f"warning: original scene missing: {src_scene}",
                      file=sys.stderr)
                continue
            cache.load(src_scene)
            xyz = np.load(chunk_dir / "coord.npy")
            pc_coord, pc_segs = cache.slice_near(xyz, k, dist_limit)
            np.save(chunk_dir / "pc_coord.npy", pc_coord)
            for name, arr in pc_segs.items():
                np.save(chunk_dir / f"pc_{name}", arr)
            if write_semseg_label:
                for name, arr in cache.label_gaussians(xyz, dist_limit).items():
                    if "nyu" in name:
                        np.save(chunk_dir / name, arr)
            print(f"[{subdir.name}] {chunk_dir.name}: "
                  f"{pc_coord.shape[0]} pc points")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--gs-root", required=True, type=Path)
    ap.add_argument("--pc-root", required=True, type=Path)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--dist-limit", type=float, default=0.25)
    ap.add_argument("--write-semseg-label", action="store_true")
    ap.add_argument("--scene-splits", nargs="*", default=["val", "test"])
    ap.add_argument("--skip-scene-level", action="store_true")
    ap.add_argument("--skip-chunks", action="store_true")
    args = ap.parse_args()
    if not args.skip_scene_level:
        copy_scene_level(args.gs_root, args.pc_root, args.scene_splits)
    if not args.skip_chunks:
        process_chunks(args.gs_root, args.pc_root, args.k, args.dist_limit,
                       args.write_semseg_label)


if __name__ == "__main__":
    main()
