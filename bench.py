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
    # fused single-program geometry gets SIGKILLed; below that the fused
    # program wins (fewer ~28 ms tunnel dispatches per call).
    if staged is None:
        staged = batch * n_points >= 65536
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
        return model.apply(v, p, train=False, geometry=g).feat

    out = fwd(variables, point, geom)
    out.block_until_ready()
    for _ in range(warmup - 1):
        jax.block_until_ready(fwd(variables, point, geom_fn(point)))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        g = geom_fn(point)
        fwd(variables, point, g).block_until_ready()
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
        # Default to the size with reliably-sane compile times on the
        # tunneled toolchain. Larger N compiles (65k/131k) hit pathological
        # XLA-sort / Mosaic compile zones measured at 5-30+ min (see
        # ops/pallas_sort.py) — run them only via an explicit CLI arg.
        for n in (32768, 16384):
            try:
                main(n_points=n)
                break
            except Exception as e:  # compile-helper SIGKILL surfaces as INTERNAL
                print(f"# bench at n={n} failed ({type(e).__name__}); retrying smaller",
                      file=sys.stderr)
