"""Minimal single-scene open-vocabulary inference smoke test.

Counterpart of the reference's root-level test_single_scene_lang.py (224 LoC):
load one scene's .npy assets, build the flagship LangPretrainer, optionally
load a checkpoint (orbax, or a torch .pth via the checkpoint bridge), run the
forward, compute cosine logits against text embeddings, and report per-step
pass/fail. Exercises the npy -> [N,11] feat concat -> backbone -> L2-norm ->
cosine-sim pipeline end to end (BASELINE config #1).

Usage:
    python test_single_scene_lang.py --scene <scene_dir> \
        [--weight exp/.../model/model_best] [--text-embeddings emb.npy] \
        [--subsample 100000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scenesplat_tpu


def step(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", required=True, help="scene dir of .npy assets")
    parser.add_argument("--weight", default=None, help="orbax dir or torch .pth")
    parser.add_argument("--text-embeddings", default=None)
    parser.add_argument("--subsample", type=int, default=100000)
    parser.add_argument("--grid-size", type=float, default=0.02)
    parser.add_argument("--save-features", action="store_true",
                        help="persist outputs via save_inference_features_simple")
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args()

    scenesplat_tpu.apply_platform_env()
    scenesplat_tpu.setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_BACKBONE
    from scenesplat_tpu.engines.eval import load_text_embeddings, zero_shot_predict
    from scenesplat_tpu.engines.infer import FeatureExtractor
    from scenesplat_tpu.models import build_model

    step("1. loading scene assets")
    load = lambda k: np.load(os.path.join(args.scene, f"{k}.npy"))
    coord = load("coord").astype(np.float32)
    color = load("color").astype(np.float32) / 127.5 - 1
    opacity = load("opacity").astype(np.float32).reshape(-1, 1)
    quat = load("quat").astype(np.float32)
    scale = load("scale").astype(np.float32).clip(0, 1.5)
    feat = np.concatenate([color, opacity, quat, scale], axis=1)  # [N, 11]
    n = coord.shape[0]
    step(f"   {n} gaussians, feat dim {feat.shape[1]}")
    assert feat.shape[1] == 11

    if args.subsample and n > args.subsample:
        rng = np.random.default_rng(42)
        keep = rng.choice(n, args.subsample, replace=False)
        coord, feat = coord[keep], feat[keep]
        step(f"2. subsampled to {coord.shape[0]}")

    coord = coord - coord.min(axis=0)
    grid_coord = np.floor(coord / args.grid_size).astype(np.int32)

    step("3. building flagship model")
    model = build_model(dict(type="LangPretrainer", backbone=FLAGSHIP_BACKBONE))
    extractor = FeatureExtractor(model, patch_size=1024)

    from scenesplat_tpu.models import PointBatch

    point = PointBatch(
        coord=jnp.zeros((1, 1024, 3)),
        feat=jnp.zeros((1, 1024, 11)),
        grid_coord=jnp.zeros((1, 1024, 3), jnp.int32),
        mask=jnp.ones((1, 1024), bool),
    )
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(point)

    if args.weight:
        step(f"4. loading weights: {args.weight}")
        if args.weight.endswith((".pth", ".pt")):
            from scenesplat_tpu.utils.ckpt_bridge import (
                convert_ptv3_lang_checkpoint,
                load_torch_state_dict,
            )

            state = load_torch_state_dict(args.weight)
            params, bstats, report = convert_ptv3_lang_checkpoint(
                state, variables["params"], variables.get("batch_stats", {})
            )
            step(f"   bridged {report['filled_leaves']} leaves, "
                 f"{len(report['unused_torch_keys'])} torch keys unused")
            variables = {"params": params, "batch_stats": bstats}
        else:
            import orbax.checkpoint as ocp

            payload = ocp.StandardCheckpointer().restore(os.path.abspath(args.weight))
            variables = {
                "params": payload["params"],
                "batch_stats": payload.get("batch_stats", {}),
            }
    else:
        step("4. no weights given; using random init")

    step("5. forward")
    t0 = time.perf_counter()
    out_feat = extractor(
        variables, dict(coord=coord, feat=feat, grid_coord=grid_coord)
    )
    dt = time.perf_counter() - t0
    step(f"   feat {out_feat.shape} in {dt:.2f}s "
         f"({coord.shape[0] / dt:.0f} gaussians/s)")
    norms = np.linalg.norm(out_feat, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3), "features must be L2-normalized"

    if args.text_embeddings:
        step("6. zero-shot prediction")
        emb = load_text_embeddings(args.text_embeddings)
        if emb.shape[1] != out_feat.shape[1]:
            step(
                f"   SKIP: text dim {emb.shape[1]} != feature dim "
                f"{out_feat.shape[1]} (use SigLIP2 768-d embeddings)"
            )
        else:
            pred, prob = zero_shot_predict(out_feat, emb, confidence_threshold=0.0)
            uniq, counts = np.unique(pred, return_counts=True)
            step(f"   classes predicted: {dict(zip(uniq.tolist(), counts.tolist()))}")

    if args.save_features:
        step("7. saving features")
        from save_inference_features_simple import save_inference_output_simple

        save_inference_output_simple(
            dict(point_feat=out_feat, coord=coord),
            dict(feat=feat, coord=coord),
            os.path.basename(os.path.normpath(args.scene)),
            results_dir=args.results_dir,
        )

    step("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
