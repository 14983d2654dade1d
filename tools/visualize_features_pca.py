"""Visualize per-Gaussian features as PCA-RGB point clouds.

Counterpart of reference tools/visualize_features_pca.py (384 LoC, PCA
768->3 RGB). Loads a scene + checkpoint, extracts features, writes a PCA-
colored .ply.

Usage:
    python tools/visualize_features_pca.py --scene <scene_dir> \
        --weight <orbax dir or .pth> --output scene_pca.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scenesplat_tpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", required=True)
    parser.add_argument("--weight", default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--grid-size", type=float, default=0.02)
    parser.add_argument("--feat-file", default=None,
                        help="precomputed per-point features .npy (skip model)")
    args = parser.parse_args()
    scenesplat_tpu.apply_platform_env()
    scenesplat_tpu.setup_compilation_cache()

    from scenesplat_tpu.utils.visualization import (
        features_to_pca_colors,
        save_point_cloud_ply,
    )

    load = lambda k: np.load(os.path.join(args.scene, f"{k}.npy"))
    coord = load("coord").astype(np.float32)
    if args.feat_file:
        out_feat = np.load(args.feat_file)
    else:
        import jax
        import jax.numpy as jnp

        from __graft_entry__ import FLAGSHIP_BACKBONE
        from scenesplat_tpu.engines.infer import FeatureExtractor
        from scenesplat_tpu.models import PointBatch, build_model

        color = load("color").astype(np.float32) / 127.5 - 1
        opacity = load("opacity").astype(np.float32).reshape(-1, 1)
        quat = load("quat").astype(np.float32)
        scale = load("scale").astype(np.float32).clip(0, 1.5)
        feat = np.concatenate([color, opacity, quat, scale], axis=1)
        c0 = coord - coord.min(0)
        grid_coord = np.floor(c0 / args.grid_size).astype(np.int32)

        model = build_model(dict(type="LangPretrainer", backbone=FLAGSHIP_BACKBONE))
        point = PointBatch(
            coord=jnp.zeros((1, 1024, 3)), feat=jnp.zeros((1, 1024, 11)),
            grid_coord=jnp.zeros((1, 1024, 3), jnp.int32),
            mask=jnp.ones((1, 1024), bool),
        )
        variables = jax.jit(
            lambda p: model.init(
                {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
                p, train=False,
            )
        )(point)
        if args.weight:
            if args.weight.endswith((".pth", ".pt")):
                from scenesplat_tpu.utils.ckpt_bridge import (
                    convert_ptv3_lang_checkpoint, load_torch_state_dict,
                )

                params, bstats, _ = convert_ptv3_lang_checkpoint(
                    load_torch_state_dict(args.weight),
                    variables["params"], variables.get("batch_stats", {}),
                )
                variables = {"params": params, "batch_stats": bstats}
            else:
                import orbax.checkpoint as ocp

                payload = ocp.StandardCheckpointer().restore(
                    os.path.abspath(args.weight)
                )
                variables = {
                    "params": payload["params"],
                    "batch_stats": payload.get("batch_stats", {}),
                }
        extractor = FeatureExtractor(model, patch_size=1024)
        out_feat = extractor(
            variables, dict(coord=c0, feat=feat, grid_coord=grid_coord)
        )

    colors = features_to_pca_colors(out_feat)
    save_point_cloud_ply(args.output, coord, colors)
    print(f"wrote {coord.shape[0]} points -> {args.output}")


if __name__ == "__main__":
    main()
