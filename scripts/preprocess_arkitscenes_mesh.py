"""ARKitScenes mesh preprocessing: *_mesh.ply -> per-scene assets.

Counterpart of reference pointcept/datasets/preprocessing/arkitscenes/
preprocess_arkitscenes_mesh.py:1-87 — the SSL-pretraining data source in
configs/concat_dataset/ssl-pretrain-...-arkit-hyper-mcmc-base.py. Walks
``<dataset_root>/3dod/<Split>/<scene_id>/<scene_id>_3dod_mesh.ply``, reads
the mesh (numpy PLY reader, no plyfile/pandas), computes area-weighted
vertex normals (reference vertex_normal l.38-48, vectorized via np.add.at
instead of the reference's python loop over faces), and saves
coord/color/normal per scene.

Output layout (default ``npy``): ``<output_root>/<Split>/<scene_id>/
{coord,color,normal}.npy`` — the scene-directory idiom the repo's datasets
consume. ``--format pth`` instead writes ``<Split>/<scene_id>.pth`` dicts
(torch.save) byte-compatible with the reference's own output (l.58-60).

Usage:
  python scripts/preprocess_arkitscenes_mesh.py \
      --dataset_root <arkit_root> --output_root <out> [--format npy|pth]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.preprocess_scannet_raw import read_ply_mesh, vertex_normals  # noqa: E402


def parse_scene(scene_path, output_root, fmt="npy"):
    """One mesh ply -> saved scene (reference parse_scene l.51-60)."""
    split = os.path.basename(os.path.dirname(os.path.dirname(scene_path)))
    scene_id = os.path.basename(os.path.dirname(scene_path))
    verts, faces = read_ply_mesh(scene_path)
    coord = verts[:, :3]
    color = verts[:, 3:6]
    normal = vertex_normals(coord, faces)
    out_dir = os.path.join(output_root, split)
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "pth":
        import torch

        torch.save(
            dict(coord=coord, color=color, scene_id=scene_id, normal=normal),
            os.path.join(out_dir, f"{scene_id}.pth"),
        )
    else:
        scene_dir = os.path.join(out_dir, scene_id)
        os.makedirs(scene_dir, exist_ok=True)
        np.save(os.path.join(scene_dir, "coord.npy"),
                coord.astype(np.float32))
        np.save(os.path.join(scene_dir, "color.npy"), color)
        np.save(os.path.join(scene_dir, "normal.npy"),
                normal.astype(np.float32))
    print(f"{split}/{scene_id}: {len(coord)} vertices")
    return scene_id


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True,
                        help="ARKitScenes root containing 3dod/<Split>/...")
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--format", choices=("npy", "pth"), default="npy")
    parser.add_argument("--num_workers", type=int, default=8)
    args = parser.parse_args()
    # reference glob l.82: 3dod/*/*/*_mesh.ply (Training/Validation splits)
    scene_paths = sorted(
        glob.glob(os.path.join(args.dataset_root, "3dod", "*", "*",
                               "*_mesh.ply"))
    )
    if not scene_paths:
        raise SystemExit(f"no *_mesh.ply under {args.dataset_root}/3dod")
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(args.num_workers) as pool:
        futures = [
            pool.submit(parse_scene, p, args.output_root, args.format)
            for p in scene_paths
        ]
        for f in futures:
            f.result()
    print(f"processed {len(scene_paths)} scenes")


if __name__ == "__main__":
    main()
