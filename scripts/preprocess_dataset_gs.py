"""Per-dataset GS preprocessing: ply -> npy scenes with 1-NN label transfer.

One parameterized tool covering the reference's five dataset-specific
converters (pointcept/datasets/preprocessing/{scannet,scannetpp,matterport3d,
holicity,kitti360}/preprocess_*_gs.py) — they share a pipeline and differ
only in layout/label/pruning conventions, captured here as per-dataset specs:

  1. read the trained 3DGS ply (sigmoid(opacity), exp(scale), normalized
     sign-fixed wxyz quat, SH-DC -> RGB; scripts/preprocess_gs.py).
  2. optionally prune gaussians outside the fused cloud's oriented bounding
     box, enlarged per dataset (reference preprocess_scannet_gs.py:236-311
     +0.25 m, preprocess_scannetpp_gs.py:236-262 +0.2 m; matterport/
     holicity/kitti360 disable pruning). The reference uses open3d's
     minimal OBB; without open3d this uses the PCA OBB of the cloud — a
     slightly looser box, i.e. it never prunes a gaussian open3d would keep.
  3. 1-NN-transfer labels AND normals from the dataset's fused point cloud
     onto the Gaussians (reference KDTree(pc).query(gs, k=1) — note the
     reference applies NO distance cutoff; --max-dist adds one optionally).
  4. optionally attach per-Gaussian language features (+valid_feat_mask)
     from a SigLIP2 feature dump (fp16), as the reference reads
     langfeat.pth (preprocess_scannet_gs.py:270-283).
  5. save per-scene .npy assets in the reference's on-disk layout
     (scannet: segment20/segment200/instance int16; scannetpp:
     segment/instance; matterport3d: segment/segment_nyu_160; holicity/
     kitti360: segment; + normal.npy when the cloud has normals), plus
     pc_coord/pc_segment* pass-throughs for eval splits (the reference
     ships these via separate scripts; kitti360 writes them inline,
     preprocess_kitti360_gs.py:389-390).

Usage:
  python scripts/preprocess_dataset_gs.py --dataset scannet \
      --gs <ply-or-dir> --pc <pc_scene_dir> --output <out_scene_dir> \
      [--lang-feat feats.npy] [--split val] [--max-dist 0.1] [--no-prune]
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
#   label_keys: pc label files -> output names (reference on-disk names)
#   label_dtype: forced dtype of transferred labels (None = inherit source)
#   bbox_prune: OBB enlargement in meters, or None (pruning disabled)
#   eval_passthrough: save pc_coord/pc_<label> for eval-time voting
#   pc_always: write the pass-through for every split (kitti360 inlines it)
DATASET_SPECS = {
    "scannet": dict(
        # reference preprocess_scannet_gs.py:296-332
        label_keys={"segment20": "segment20", "segment200": "segment200",
                    "instance": "instance"},
        default_segment="segment20",
        label_dtype=np.int16,
        bbox_prune=0.25,
        eval_passthrough=True,
        pc_always=False,
    ),
    "scannetpp": dict(
        # reference preprocess_scannetpp_gs.py:229-313
        label_keys={"segment": "segment", "instance": "instance"},
        default_segment="segment",
        label_dtype=None,
        bbox_prune=0.2,
        eval_passthrough=True,
        pc_always=False,
    ),
    "matterport3d": dict(
        # reference preprocess_matterport3d_gs.py:203-293 (pruning disabled
        # l.252; optional segment_nyu_160 second label space)
        label_keys={"segment": "segment", "segment_nyu_160": "segment_nyu_160"},
        default_segment="segment",
        label_dtype=None,
        bbox_prune=None,
        eval_passthrough=True,
        pc_always=False,
    ),
    "holicity": dict(
        # reference preprocess_holicity_gs.py:207-285 (OBB computed but
        # pruning disabled l.248)
        label_keys={"segment": "segment"},
        default_segment="segment",
        label_dtype=None,
        bbox_prune=None,
        eval_passthrough=False,
        pc_always=False,
    ),
    "kitti360": dict(
        # reference preprocess_kitti360_gs.py:360-390 (pc_segment/pc_coord
        # saved for every scene)
        label_keys={"segment": "segment"},
        default_segment="segment",
        label_dtype=None,
        bbox_prune=None,
        eval_passthrough=True,
        pc_always=True,
    ),
}


def _min_volume_obb_frame(pc):
    """Minimal-volume OBB axes via the hull-triangle heuristic Open3D's
    ``get_minimal_oriented_bounding_box`` documents: for every convex-hull
    triangle, take the hull's AABB in that triangle's frame; keep the
    smallest-volume frame. Returns [3, 3] axis columns (falls back to PCA
    axes when qhull is unavailable/degenerate)."""
    try:
        from scipy.spatial import ConvexHull

        hull = ConvexHull(pc)
        verts = pc[hull.vertices]  # [M, 3]
        tris = pc[hull.simplices]  # [T, 3, 3]
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        z = np.cross(e1, e2)
        zn = np.linalg.norm(z, axis=1)
        x1n = np.linalg.norm(e1, axis=1)
        ok = (zn > 1e-12) & (x1n > 1e-12)
        z = z[ok] / zn[ok, None]
        x = e1[ok] / x1n[ok, None]
        y = np.cross(z, x)
        frames = np.stack([x, y, z], axis=-1)  # [T, 3, 3] axis columns
        proj = np.einsum("mi,tij->tmj", verts, frames)  # [T, M, 3]
        ext = proj.max(1) - proj.min(1)
        best = int(np.argmin(ext.prod(1)))
        return frames[best]
    except Exception:
        cov = np.cov((pc - pc.mean(0)).T)
        _, axes = np.linalg.eigh(cov)
        return axes


def pca_obb_mask(pc_coord, gs_coord, enlargement):
    """Boolean keep-mask of gaussians inside the minimal-volume oriented
    bounding box of the fused cloud, extended by ``enlargement`` meters per
    face (reference: o3d get_minimal_oriented_bounding_box + extent +
    2*enlargement, preprocess_scannet_gs.py:235-241, 311). The box axes come
    from the same hull-triangle-frame search o3d documents — a PCA box is
    NOT a superset of the minimal OBB and could prune gaussians the
    reference keeps."""
    pc = np.asarray(pc_coord, np.float64)
    axes = _min_volume_obb_frame(pc)
    proj = pc @ axes
    lo, hi = proj.min(0), proj.max(0)
    # o3d's box is centered on the hull extents; enlarging the extent by
    # 2*enlargement adds `enlargement` per face
    lo, hi = lo - enlargement, hi + enlargement
    gproj = np.asarray(gs_coord, np.float64) @ axes
    return np.all((gproj >= lo) & (gproj <= hi), axis=1)


def nearest_pc_index(gs_coord, pc_coord):
    """Index of each gaussian's nearest fused-cloud point (reference
    KDTree(pc_coord).query(gs_coord, k=1))."""
    from scenesplat_tpu import native

    return native.knn(pc_coord.astype(np.float32),
                      gs_coord.astype(np.float32), 1)[:, 0]


def transfer_labels(gs_coord, pc_coord, pc_labels, max_dist=None,
                    ignore_index=-1, nn_idx=None):
    """1-NN label transfer (reference preprocess_*_gs.py KDTree transfer —
    the reference applies NO distance cutoff; pass ``max_dist`` to mark
    gaussians farther than it as ``ignore_index``)."""
    if nn_idx is None:
        nn_idx = nearest_pc_index(gs_coord, pc_coord)
    labels = np.asarray(pc_labels).reshape(-1)
    out = labels[nn_idx]
    if not np.issubdtype(out.dtype, np.signedinteger):
        out = out.astype(np.int32)
    if max_dist is not None:
        d = np.linalg.norm(pc_coord[nn_idx] - gs_coord, axis=1)
        out = out.copy()
        out[d > max_dist] = ignore_index
    return out


def process_scene(dataset, gs_path, pc_dir, out_dir, lang_feat_path=None,
                  split="train", max_dist=None, prune=True):
    spec = DATASET_SPECS[dataset]
    os.makedirs(out_dir, exist_ok=True)
    data = read_gaussian_ply(gs_path)
    coord = data["coord"]
    keep = np.ones(len(coord), bool)

    pc_coord = None
    if pc_dir and os.path.exists(os.path.join(pc_dir, "coord.npy")):
        pc_coord = np.load(os.path.join(pc_dir, "coord.npy"))
        if prune and spec["bbox_prune"] is not None:
            keep = pca_obb_mask(pc_coord, coord, spec["bbox_prune"])
            coord = coord[keep]

    for key, value in data.items():
        np.save(os.path.join(out_dir, f"{key}.npy"), value[keep])

    if pc_coord is not None:
        nn_idx = nearest_pc_index(coord, pc_coord)
        normal_path = os.path.join(pc_dir, "normal.npy")
        if os.path.exists(normal_path):
            normal = np.load(normal_path)
            np.save(os.path.join(out_dir, "normal.npy"),
                    normal[nn_idx].astype(np.float32))
        for src, dst in spec["label_keys"].items():
            path = os.path.join(pc_dir, f"{src}.npy")
            if not os.path.exists(path):
                continue
            pc_labels = np.load(path).reshape(-1)
            labels = transfer_labels(coord, pc_coord, pc_labels, max_dist,
                                     nn_idx=nn_idx)
            if spec["label_dtype"] is not None:
                labels = labels.astype(spec["label_dtype"])
            np.save(os.path.join(out_dir, f"{dst}.npy"), labels)
        if spec["eval_passthrough"] and (spec["pc_always"] or split != "train"):
            np.save(os.path.join(out_dir, "pc_coord.npy"),
                    pc_coord.astype(np.float32))
            for src in spec["label_keys"]:
                seg_path = os.path.join(pc_dir, f"{src}.npy")
                if os.path.exists(seg_path):
                    np.save(os.path.join(out_dir, f"pc_{src}.npy"),
                            np.load(seg_path).reshape(-1).astype(np.int32))

    if lang_feat_path and os.path.exists(lang_feat_path):
        feat = np.load(lang_feat_path)
        assert feat.shape[0] == keep.shape[0], (
            f"lang feat rows {feat.shape[0]} != gaussians {keep.shape[0]}"
        )
        feat = feat[keep]
        # reference saves the zero-row mask as int (preprocess_scannet_gs.py
        # :274, 317)
        valid = np.any(feat != 0.0, axis=1).astype(np.int64)
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
    parser.add_argument("--max-dist", type=float, default=None,
                        help="optional 1-NN distance cutoff (the reference "
                             "transfers unconditionally)")
    parser.add_argument("--no-prune", action="store_true",
                        help="disable the per-dataset OBB pruning")
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
                max_dist=args.max_dist, prune=not args.no_prune,
            )
    else:
        process_scene(args.dataset, args.gs, args.pc, args.output,
                      lang_feat_path=args.lang_feat, split=args.split,
                      max_dist=args.max_dist, prune=not args.no_prune)
    print("done")


if __name__ == "__main__":
    main()
