"""Benchmark: flagship encoder-decoder forward throughput on real hardware.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Gaussians processed per second by a LangPretrainer (PT-v3m1 flagship
VL config, in_channels=11, 4 curves, patch 1024) eval forward on a single
chip. The reference publishes no throughput numbers (BASELINE.md); the
normalization target is 1e6 Gaussians/sec/chip, the "A100-class encoder
forward" north star from BASELINE.md, so vs_baseline = value / 1e6.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(n_points: int = 131072, batch: int = 1, iters: int = 10, warmup: int = 3):
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
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(point)

    @jax.jit
    def fwd(v, p):
        return model.apply(v, p, train=False).feat

    out = fwd(variables, point)
    out.block_until_ready()
    for _ in range(warmup - 1):
        fwd(variables, point).block_until_ready()

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fwd(variables, point).block_until_ready()
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
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


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1:
        main(n_points=int(sys.argv[1]))
    else:
        # the tunneled compile helper on this host has a hard memory cap and
        # very slow large-N sort compiles; 32k is the largest size that
        # compiles reliably (see CLAUDE.md), with a fallback
        for n in (32768, 16384):
            try:
                main(n_points=n)
                break
            except Exception as e:  # compile-helper SIGKILL surfaces as INTERNAL
                print(f"# bench at n={n} failed ({type(e).__name__}); retrying smaller",
                      file=sys.stderr)
