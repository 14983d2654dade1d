"""Benchmark: flagship encoder-decoder forward throughput on real hardware.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Gaussians processed per second by a LangPretrainer (PT-v3m1 flagship
VL config, in_channels=11, 4 curves, patch 1024) eval forward on a single
chip. The reference publishes no throughput numbers (BASELINE.md); the
normalization target is 1e6 Gaussians/sec/chip, the "A100-class encoder
forward" north star from BASELINE.md, so vs_baseline = value / 1e6.

The forward is split into two jitted programs (geometry: serialization +
conv/pooling plans, int-only; network: the parameterized compute) — each
fits the tunneled compile-helper's memory cap, unlocking N >= 64k that the
single-program compile could not reach (CLAUDE.md round-1 notes). Timing
covers BOTH programs, as a training step would.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main(n_points: int = 131072, batch: int = 1, iters: int = 10, warmup: int = 3,
         staged: bool | None = None):
    import jax
    import jax.numpy as jnp

    import scenesplat_tpu

    scenesplat_tpu.setup_compilation_cache()

    from __graft_entry__ import FLAGSHIP_BACKBONE, _make_inputs
    from scenesplat_tpu.models import PointBatch, build_model

    backbone = dict(FLAGSHIP_BACKBONE, dtype=jnp.bfloat16)
    model = build_model(dict(type="LangPretrainer", backbone=backbone))

    rng = np.random.default_rng(0)
    coord, feat, grid_coord, mask = _make_inputs(rng, batch, n_points)
    point = PointBatch(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(feat),
        grid_coord=jnp.asarray(grid_coord),
        mask=jnp.asarray(mask),
    )

    from scenesplat_tpu.models.ptv3 import PointTransformerV3

    bb_module = PointTransformerV3(
        **{k: v for k, v in backbone.items() if k != "type"}
    )
    # Staged geometry (one jitted program per construction step) compiles
    # within the tunneled compile helper's memory cap at N >= 64k where the
    # fused single-program geometry gets SIGKILLed; below that one fused
    # geometry+network program wins (single dispatch, XLA overlaps the int
    # geometry pipeline with the network matmuls).
    if staged is None:
        staged = batch * n_points >= 65536
    if not staged:
        variables = jax.jit(
            lambda p: model.init(
                {"params": jax.random.PRNGKey(0),
                 "shuffle": jax.random.PRNGKey(1)},
                p, train=False,
            )
        )(point)

        @jax.jit
        def fwd_full(v, p):
            return jnp.sum(
                model.apply(v, p, train=False).feat.astype(jnp.float32)
            )

        float(fwd_full(variables, point))
        for _ in range(warmup - 1):
            float(fwd_full(variables, point))
        t0 = time.perf_counter()
        sums = [fwd_full(variables, point) for _ in range(iters)]
        total = float(jnp.sum(jnp.stack(sums)))
        dt = (time.perf_counter() - t0) / iters
        assert np.isfinite(total)
        gps = batch * n_points / dt
        print(
            json.dumps(
                {
                    "metric": "encoder_fwd_gaussians_per_sec",
                    "value": round(gps, 1),
                    "unit": "gaussians/s",
                    "vs_baseline": round(gps / 1e6, 4),
                }
            )
        )
        return
    geom_fn = (
        bb_module.build_geometry_staged if staged
        else jax.jit(bb_module.build_geometry)
    )
    geom = geom_fn(point)
    jax.block_until_ready(geom)

    variables = jax.jit(
        lambda p, g: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
            geometry=g,
        )
    )(point, geom)

    @jax.jit
    def fwd(v, p, g):
        # scalar output: a host fetch of the result is a true completion sync
        # on the tunneled runtime (block_until_ready may not block, CLAUDE.md)
        return jnp.sum(model.apply(v, p, train=False, geometry=g).feat.astype(jnp.float32))

    out = fwd(variables, point, geom)
    float(out)
    for _ in range(warmup - 1):
        float(fwd(variables, point, geom_fn(point)))

    # throughput timing: dispatch all iterations (independent steps, as a
    # production inference stream would), sync once at the end — the ~28 ms
    # tunnel RPC floor pipelines instead of serializing per step
    t0 = time.perf_counter()
    sums = [fwd(variables, point, geom_fn(point)) for _ in range(iters)]
    total = float(jnp.sum(jnp.stack(sums)))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(total)
    gps = batch * n_points / dt
    print(
        json.dumps(
            {
                "metric": "encoder_fwd_gaussians_per_sec",
                "value": round(gps, 1),
                "unit": "gaussians/s",
                "vs_baseline": round(gps / 1e6, 4),
            }
        )
    )


def main_train(n_points: int = 32768, batch: int = 1, iters: int = 5,
               warmup: int = 2):
    """Training-step throughput: staged geometry programs + jitted
    fwd+bwd+AdamW over the flagship VL losses. Geometry is rebuilt every
    iteration (train re-serializes each step: augmentations move points).
    Prints the same one-line JSON with metric train_step_gaussians_per_sec."""
    import jax
    import jax.numpy as jnp

    import scenesplat_tpu

    scenesplat_tpu.setup_compilation_cache()

    from __graft_entry__ import FLAGSHIP_BACKBONE, _make_inputs
    from scenesplat_tpu.engines.train_step import (
        create_train_state, make_train_step, point_from_batch,
    )
    from scenesplat_tpu.models import build_criteria, build_model
    from scenesplat_tpu.models.ptv3 import PointTransformerV3
    from scenesplat_tpu.utils.optimizer import build_optimizer

    backbone = dict(FLAGSHIP_BACKBONE, dtype=jnp.bfloat16)
    model = build_model(dict(type="LangPretrainer", backbone=backbone))
    criteria = build_criteria(
        [
            dict(type="CosineSimilarity", loss_weight=1.0),
            dict(type="L2Loss", loss_weight=1.0),
            dict(type="AggregatedContrastiveLoss", loss_weight=0.02,
                 schedule="last_75", num_classes=256),
        ]
    )
    rng = np.random.default_rng(0)
    coord, feat, grid_coord, mask = _make_inputs(rng, batch, n_points)
    d_lang = backbone["dec_channels"][0]
    batch_dict = {
        "coord": jnp.asarray(coord),
        "feat": jnp.asarray(feat),
        "grid_coord": jnp.asarray(grid_coord),
        "mask": jnp.asarray(mask),
        "lang_feat": jnp.asarray(
            rng.normal(size=(batch, n_points, d_lang)).astype(np.float32)
        ),
        "valid_feat_mask": jnp.asarray(rng.random((batch, n_points)) > 0.3),
        "segment": jnp.asarray(
            rng.integers(0, 100, size=(batch, n_points)).astype(np.int32)
        ),
        "epoch_progress": jnp.asarray(0.9, jnp.float32),
    }
    tx = build_optimizer(
        dict(type="AdamW", lr=6e-3, weight_decay=0.05),
        params=None, total_steps=1000, clip_grad=1.0,
    )
    state = create_train_state(model, tx, point_from_batch(batch_dict))
    step = jax.jit(make_train_step(model, criteria, tx, task="lang"),
                   donate_argnums=(0,))

    bb_module = PointTransformerV3(
        **{k: v for k, v in backbone.items() if k != "type"}
    )
    point = point_from_batch(batch_dict)

    # geometry must be its own program (fwd+bwd+geometry fused exceeds the
    # tunnel compile memory cap at 32k) but below 64k the single fused
    # geometry program beats the staged per-step programs (fewer dispatches)
    if batch * n_points < 65536:
        geom_jit = jax.jit(bb_module.build_geometry)

        def geom(i):
            return geom_jit(point, shuffle_rng=jax.random.PRNGKey(i))
    else:
        def geom(i):
            return bb_module.build_geometry_staged(
                point, shuffle_rng=jax.random.PRNGKey(i)
            )

    for i in range(warmup):
        state, metrics = step(state, batch_dict, geom(i))
        float(metrics["loss"])  # host fetch = true sync on the tunnel

    # steady-state throughput: steps chain through the donated state, so the
    # device serializes them; dispatching ahead pipelines the tunnel RPC floor
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch_dict, geom(100 + i))
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)

    gps = batch * n_points / dt
    print(
        json.dumps(
            {
                "metric": "train_step_gaussians_per_sec",
                "value": round(gps, 1),
                "unit": "gaussians/s",
                "vs_baseline": round(gps / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "train":
        main_train(n_points=int(sys.argv[2]) if len(sys.argv) > 2 else 32768)
    elif len(sys.argv) > 1:
        main(n_points=int(sys.argv[1]))
    else:
        # Default to the size with reliably-sane compile times on the
        # tunneled toolchain. Larger N compiles (65k/131k) hit pathological
        # XLA-sort / Mosaic compile zones measured at 5-30+ min (see
        # ops/pallas_sort.py) — run them only via an explicit CLI arg.
        # Second sweep retries with the jnp reference attention so a Mosaic
        # regression in the Pallas kernel degrades the number instead of
        # killing the bench.
        done = False
        for no_pallas in (False, True):
            if no_pallas:
                os.environ["SCENESPLAT_NO_PALLAS_ATTN"] = "1"
                print("# retrying with reference (non-Pallas) attention",
                      file=sys.stderr)
            for n in (32768, 16384):
                try:
                    main(n_points=n)
                    done = True
                    break
                except Exception as e:  # helper SIGKILL surfaces as INTERNAL
                    print(f"# bench at n={n} failed ({type(e).__name__}); retrying",
                          file=sys.stderr)
            if done:
                break
