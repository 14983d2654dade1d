"""Scene chunking for large 3DGS scenes.

Counterpart of reference pointcept/datasets/preprocessing/
sampling_chunking_data_gs.py:10-157: optional grid dedup preferring Gaussians
with valid language features, lang_feat re-normalization, BEV chunking into
``chunk_range`` (default 6x6 m) tiles with ``chunk_stride`` (3x3 m) overlap,
minimum chunk size, and an optional cap on chunks per scene.

``--with-pc`` adds the KITTI-360 joint GS+PC mode (reference
pointcept/datasets/preprocessing/kitti360/sampling_chunking_data_gs_pc.py:
10-246): ``pc_*`` assets (the eval point cloud, e.g. pc_coord/pc_segment)
are chunked with the SAME BEV tiles but masked by ``pc_coord`` recentred by
its own min (reference l.35,94-99), so each chunk carries its matching
eval-cloud slice. Chunk acceptance still counts Gaussians only (l.103).
Grid dedup applies to Gaussian assets only — the reference indexes pc
arrays with the GS-derived dedup index (l.44-45), which only works when
grid_size is unset (its documented KITTI-360 usage, l.240-246).

Usage:
    python scripts/sampling_chunking_data_gs.py --dataset_root data/my_gs \
        --output_root data/my_gs_chunked --split train \
        [--grid_size 0.01 --chunk_range 6 6 --chunk_stride 3 3]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chunk_scene(
    name,
    dataset_root,
    output_root,
    split,
    grid_size=None,
    chunk_range=(6, 6),
    chunk_stride=(3, 3),
    chunk_minimum_size=10000,
    max_chunk_num=None,
    seed=0,
    with_pc=False,
):
    scene_path = os.path.join(dataset_root, split, name)
    data = {
        f[:-4]: np.load(os.path.join(scene_path, f))
        for f in sorted(os.listdir(scene_path))
        if f.endswith(".npy")
    }
    coord = data["coord"] - data["coord"].min(axis=0)
    pc_keys = [k for k in data if k.startswith("pc_")] if with_pc else []
    if with_pc and "pc_coord" not in data:
        raise ValueError(f"{name}: --with-pc needs pc_coord.npy")
    # eval cloud recentred by its OWN min (reference gs_pc chunker l.35)
    pc_coord = (data["pc_coord"] - data["pc_coord"].min(axis=0)
                if pc_keys else None)

    if "lang_feat" in data and "valid_feat_mask" in data:
        valid = data["valid_feat_mask"].astype(bool)
        lf = data["lang_feat"].astype(np.float32)
        norms = np.linalg.norm(lf[valid], axis=1, keepdims=True)
        lf[valid] = lf[valid] / np.maximum(norms, 1e-12)
        data["lang_feat"] = lf.astype(data["lang_feat"].dtype)

    if grid_size is not None:
        # grid dedup preferring valid-lang-feat Gaussians
        from scenesplat_tpu import native

        gc = np.floor(coord / grid_size).astype(np.int32)
        if "valid_feat_mask" in data:
            # two-pass: sample among valid first, fill cells with no valid pick
            valid = data["valid_feat_mask"].astype(bool)
            idx_valid, _ = native.grid_sample_train(gc[valid], seed=seed)
            idx_valid = np.nonzero(valid)[0][idx_valid]
            idx_all, cell = native.grid_sample_train(gc, seed=seed)
            covered = np.zeros(cell.max() + 1, bool)
            covered[cell[idx_valid]] = True
            extra = idx_all[~covered[cell[idx_all]]]
            keep = np.sort(np.concatenate([idx_valid, extra]))
        else:
            keep, _ = native.grid_sample_train(gc, seed=seed)
            keep = np.sort(keep)
        n = coord.shape[0]
        for key, value in list(data.items()):
            if key in pc_keys:
                continue  # dedup is over GS coords; eval cloud untouched
            if isinstance(value, np.ndarray) and value.shape[:1] == (n,):
                data[key] = value[keep]
        coord = coord[keep]

    rng = np.random.default_rng(seed)
    bev_min = coord[:, :2].min(axis=0)
    bev_max = coord[:, :2].max(axis=0)
    # tile starts run to extent + stride - range (reference
    # sampling_chunking_data_gs.py:87-89): the last tile overhangs the max
    # so scene tails are covered; clamped to >= one tile for scenes smaller
    # than a chunk (the reference would emit zero chunks there)
    ext = bev_max - bev_min
    xs = np.arange(
        bev_min[0],
        bev_min[0] + max(ext[0] + chunk_stride[0] - chunk_range[0], 1e-6),
        chunk_stride[0])
    ys = np.arange(
        bev_min[1],
        bev_min[1] + max(ext[1] + chunk_stride[1] - chunk_range[1], 1e-6),
        chunk_stride[1])
    chunks = []
    for x0 in xs:
        for y0 in ys:
            sel = (
                (coord[:, 0] >= x0) & (coord[:, 0] < x0 + chunk_range[0])
                & (coord[:, 1] >= y0) & (coord[:, 1] < y0 + chunk_range[1])
            )
            # acceptance counts Gaussians only (reference gs_pc l.103)
            if sel.sum() >= chunk_minimum_size:
                pc_sel = None
                if pc_coord is not None:
                    pc_sel = (
                        (pc_coord[:, 0] >= x0)
                        & (pc_coord[:, 0] < x0 + chunk_range[0])
                        & (pc_coord[:, 1] >= y0)
                        & (pc_coord[:, 1] < y0 + chunk_range[1])
                    )
                chunks.append((sel, pc_sel))
    if max_chunk_num and len(chunks) > max_chunk_num:
        chunks = [chunks[i] for i in rng.permutation(len(chunks))[:max_chunk_num]]

    out_split = os.path.join(
        output_root,
        f"{split}_grid{(grid_size or 0) * 100:.1f}cm_"
        f"chunk{chunk_range[0]}x{chunk_range[1]}_"
        f"stride{chunk_stride[0]}x{chunk_stride[1]}",
    )
    n = coord.shape[0]
    for ci, (sel, pc_sel) in enumerate(chunks):
        chunk_dir = os.path.join(out_split, f"{name}_{ci}")
        os.makedirs(chunk_dir, exist_ok=True)
        for key, value in data.items():
            if key in pc_keys:
                np.save(os.path.join(chunk_dir, f"{key}.npy"), value[pc_sel])
            elif isinstance(value, np.ndarray) and value.shape[:1] == (n,):
                np.save(os.path.join(chunk_dir, f"{key}.npy"), value[sel])
    print(f"{name}: {len(chunks)} chunks -> {out_split}")
    return len(chunks)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--grid_size", type=float, default=None)
    parser.add_argument("--chunk_range", type=float, nargs=2, default=(6, 6))
    parser.add_argument("--chunk_stride", type=float, nargs=2, default=(3, 3))
    parser.add_argument("--chunk_minimum_size", type=int, default=10000)
    parser.add_argument("--max_chunk_num", type=int, default=None)
    parser.add_argument("--with_pc", "--with-pc", action="store_true",
                        help="KITTI-360 joint GS+PC mode: chunk pc_* assets "
                             "with the same tiles (reference "
                             "sampling_chunking_data_gs_pc.py)")
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args()
    names = sorted(os.listdir(os.path.join(args.dataset_root, args.split)))
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(args.num_workers) as pool:
        futures = [
            pool.submit(
                chunk_scene, name, args.dataset_root, args.output_root,
                args.split, args.grid_size, tuple(args.chunk_range),
                tuple(args.chunk_stride), args.chunk_minimum_size,
                args.max_chunk_num, with_pc=args.with_pc,
            )
            for name in names
        ]
        total = sum(f.result() for f in futures)
    print(f"total chunks: {total}")


if __name__ == "__main__":
    main()
