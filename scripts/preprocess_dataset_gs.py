"""Per-dataset GS preprocessing: ply -> npy scenes with 1-NN label transfer.

One parameterized tool covering the reference's five dataset-specific
converters (pointcept/datasets/preprocessing/{scannet,scannetpp,matterport3d,
holicity,kitti360}/preprocess_*_gs.py) — they share a pipeline and differ
only in layout/label conventions, captured here as per-dataset specs:

  1. read the trained 3DGS ply (sigmoid(opacity), exp(scale), normalized
     sign-fixed wxyz quat, SH-DC -> RGB; scripts/preprocess_gs.py).
  2. 1-NN-transfer semantic (and optionally instance) labels from the
     dataset's fused point cloud onto the Gaussians, using the native
     grid-hash kNN (scenesplat_tpu/native) with a distance cutoff.
  3. optionally attach per-Gaussian language features (+valid_feat_mask)
     from a SigLIP2 feature dump (fp16), as scripts/encode_labels.py does
     for text.
  4. save per-scene .npy assets in the layout data/gs_datasets.py expects,
     plus pc_coord/pc_segment pass-throughs for eval splits.

Usage:
  python scripts/preprocess_dataset_gs.py --dataset scannet \
      --gs <ply-or-dir> --pc <pc_scene_dir> --output <out_scene_dir> \
      [--lang-feat feats.npy] [--split val] [--max-dist 0.1]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.preprocess_gs import read_gaussian_ply  # noqa: E402


# per-dataset conventions (reference preprocess_*_gs.py files):
#   label_keys: pc label files -> output names
#   eval_passthrough: save the fused cloud for eval-time voting
DATASET_SPECS = {
    "scannet": dict(
        label_keys={"segment20": "segment20", "segment200": "segment200",
                    "instance": "pc_instance"},
        default_segment="segment20",
        eval_passthrough=True,
    ),
    "scannetpp": dict(
        label_keys={"segment": "segment", "instance": "pc_instance"},
        default_segment="segment",
        eval_passthrough=True,
    ),
    "matterport3d": dict(
        label_keys={"segment": "segment", "segment_nyu_160": "segment160"},
        default_segment="segment",
        eval_passthrough=True,
    ),
    "holicity": dict(
        label_keys={"segment": "segment"},
        default_segment="segment",
        eval_passthrough=False,
    ),
    "kitti360": dict(
        label_keys={"segment": "segment"},
        default_segment="segment",
        eval_passthrough=True,
    ),
}


def transfer_labels(gs_coord, pc_coord, pc_labels, max_dist=0.1,
                    ignore_index=-1):
    """1-NN label transfer with a distance cutoff (reference
    preprocess_matterport3d_gs.py:149-290 semantics)."""
    from scenesplat_tpu import native

    idx = native.knn(pc_coord.astype(np.float32),
                     gs_coord.astype(np.float32), 1)[:, 0]
    d = np.linalg.norm(pc_coord[idx] - gs_coord, axis=1)
    out = pc_labels[idx].astype(np.int32)
    out[d > max_dist] = ignore_index
    return out


def process_scene(dataset, gs_path, pc_dir, out_dir, lang_feat_path=None,
                  split="train", max_dist=0.1):
    spec = DATASET_SPECS[dataset]
    os.makedirs(out_dir, exist_ok=True)
    data = read_gaussian_ply(gs_path)
    coord = data["coord"]
    for key, value in data.items():
        np.save(os.path.join(out_dir, f"{key}.npy"), value)

    pc_coord = None
    if pc_dir and os.path.exists(os.path.join(pc_dir, "coord.npy")):
        pc_coord = np.load(os.path.join(pc_dir, "coord.npy"))
        for src, dst in spec["label_keys"].items():
            path = os.path.join(pc_dir, f"{src}.npy")
            if not os.path.exists(path):
                continue
            pc_labels = np.load(path).reshape(-1)
            labels = transfer_labels(coord, pc_coord, pc_labels, max_dist)
            np.save(os.path.join(out_dir, f"{dst}.npy"), labels)
            if src == spec["default_segment"]:
                np.save(os.path.join(out_dir, "segment.npy"), labels)
        if spec["eval_passthrough"] and split != "train":
            np.save(os.path.join(out_dir, "pc_coord.npy"),
                    pc_coord.astype(np.float32))
            seg_path = os.path.join(pc_dir, f"{spec['default_segment']}.npy")
            if os.path.exists(seg_path):
                np.save(os.path.join(out_dir, "pc_segment.npy"),
                        np.load(seg_path).reshape(-1).astype(np.int32))

    if lang_feat_path and os.path.exists(lang_feat_path):
        feat = np.load(lang_feat_path)
        assert feat.shape[0] == coord.shape[0], (
            f"lang feat rows {feat.shape[0]} != gaussians {coord.shape[0]}"
        )
        valid = np.any(feat != 0.0, axis=1)
        np.save(os.path.join(out_dir, "lang_feat.npy"),
                feat.astype(np.float16))
        np.save(os.path.join(out_dir, "valid_feat_mask.npy"), valid)
    return out_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=sorted(DATASET_SPECS))
    parser.add_argument("--gs", required=True,
                        help="GS .ply file, or a directory of scene plys")
    parser.add_argument("--pc", default=None,
                        help="fused point-cloud scene dir (coord/segment npy)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--lang-feat", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--max-dist", type=float, default=0.1)
    args = parser.parse_args()

    if os.path.isdir(args.gs):
        plys = sorted(glob.glob(os.path.join(args.gs, "**", "*.ply"),
                                recursive=True))
        for ply in plys:
            name = os.path.splitext(os.path.basename(ply))[0]
            process_scene(
                args.dataset, ply,
                os.path.join(args.pc, name) if args.pc else None,
                os.path.join(args.output, name),
                lang_feat_path=args.lang_feat, split=args.split,
                max_dist=args.max_dist,
            )
    else:
        process_scene(args.dataset, args.gs, args.pc, args.output,
                      lang_feat_path=args.lang_feat, split=args.split,
                      max_dist=args.max_dist)
    print("done")


if __name__ == "__main__":
    main()
