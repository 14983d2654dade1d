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
         staged: bool | None = None, outdoor: bool = False,
         outdoor_join: bool = False):
    import jax
    import jax.numpy as jnp

    import scenesplat_tpu

    scenesplat_tpu.setup_compilation_cache()

    from __graft_entry__ import FLAGSHIP_BACKBONE, _make_inputs
    from scenesplat_tpu.models import PointBatch, build_model

    backbone = dict(FLAGSHIP_BACKBONE, dtype=jnp.bfloat16)
    if outdoor:
        # unbounded-scene configuration (KITTI-360/HoliCity shaped): no
        # static dense_extent; deeper serialization covers the larger grid
        # (VERDICT r2 item 9). Conv plans default to the bucketized hash
        # grid (ops/hash_grid.py — dense-path structure, O(N) memory, flat
        # compile cost); outdoor_join falls back to the merge-join sorts
        # for an on-hardware comparison.
        backbone.pop("dense_extent", None)
        backbone["serialization_depth"] = 12
        backbone["hash_grid"] = not outdoor_join
    model = build_model(dict(type="LangPretrainer", backbone=backbone))

    rng = np.random.default_rng(0)
    coord, feat, grid_coord, mask = _make_inputs(
        rng, batch, n_points,
        **(dict(grid_size=0.05, extent=100.0) if outdoor else {}),
    )
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


def _canary():
    """Tiny device round-trip on the default platform. A dead tunnel hangs
    here (and only burns the canary's subprocess timeout, not the ladder's)."""
    import jax.numpy as jnp

    val = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
    assert val == 128.0 * 128 * 128
    print(json.dumps({"metric": "canary", "value": 1, "unit": "ok",
                      "vs_baseline": 1}))


def _run_worker(args, timeout, extra_env=None):
    """Run `python bench.py --worker ...` in a subprocess with a hard
    deadline; return (parsed-JSON, error-string)."""
    import subprocess
    import sys

    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout:.0f}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        return None, f"rc={r.returncode}: {' | '.join(tail)[:300]}"
    for line in reversed((r.stdout or "").strip().splitlines()):
        try:
            obj = json.loads(line)
        except (ValueError, TypeError):
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj, None
    return None, "worker printed no JSON line"


def _orchestrate(kind: str):
    """Fail-fast bench driver: a short canary first (a down tunnel becomes an
    immediate JSON error instead of a silent rc=124), then a retry ladder
    where every attempt has its own subprocess deadline inside one overall
    wall-clock budget. ALWAYS prints exactly one JSON result line and exits 0
    (VERDICT.md round-1 item 1b)."""
    import sys

    t0 = time.monotonic()
    # train default is larger: the train-step program embeds Pallas custom
    # calls, which the tunnel never persist-caches — a cold run pays the
    # full ~25 min compile every time (measured 2026-08-20)
    budget = float(os.environ.get(
        "SCENESPLAT_BENCH_BUDGET", "3600" if kind == "train" else "1200"))
    metric = ("train_step_gaussians_per_sec" if kind == "train"
              else "encoder_fwd_gaussians_per_sec")

    def fail(err):
        print(json.dumps({"metric": metric, "value": 0, "unit": "gaussians/s",
                          "vs_baseline": 0, "error": err}))

    obj, err = _run_worker(["--worker", "canary"], timeout=min(240.0, budget))
    if obj is None:
        fail(f"tpu unreachable ({err})")
        return
    print(f"# canary ok at {time.monotonic() - t0:.0f}s", file=sys.stderr)

    # Ladder: the RELIABLE rung comes first — pure-XLA attention compiles in
    # minutes, while a cold Pallas flagship compile alone ate a 900 s worker
    # budget in r4 (the 814 s Mosaic compile, CLAUDE.md) and left the driver
    # with value=0. Pallas variants are UPGRADE rungs attempted after a
    # number is already banked (head-padded first: Cg=128, 2-way unroll,
    # far cheaper Mosaic compile).
    no_pallas = {"SCENESPLAT_NO_PALLAS_ATTN": "1"}
    pad64 = {"SCENESPLAT_ATTN_PAD_HEAD": "1"}
    if kind == "train":
        # Train CANNOT run no-Pallas at 32k: the jnp attention backward
        # materializes probability tensors and the step needs 18.97G of the
        # v5e's 15.75G HBM (measured 2026-08-20). The head-padded Pallas
        # kernel is both the memory fix and a sane compile (36.7 s bwd vs
        # 814 s unpadded).
        # per-rung timeout: programs containing Pallas custom calls are
        # never persist-cached by the tunnel, so the first train rung pays
        # the FULL compile every cold run (~20 min measured) — and killing
        # the client mid-compile leaves an orphan serializing the helper
        # (CLAUDE.md). Size the cap to completion.
        ladder = [
            (["--worker", "train", "32768"], None, 2400.0),
            (["--worker", "train", "16384"], no_pallas, 900.0),
        ]
        upgrades = []
    else:
        ladder = [
            (["--worker", "fwd", "32768"], no_pallas, 900.0),
            (["--worker", "fwd", "16384"], no_pallas, 900.0),
        ]
        upgrades = [(["--worker", "fwd", "32768"], pad64, 1200.0)]
    last_err = "no attempt had enough budget"
    for args, extra_env, cap in ladder:
        remaining = budget - (time.monotonic() - t0) - 15
        if remaining < 120:
            break
        obj, err = _run_worker(args, timeout=min(cap, remaining),
                               extra_env=extra_env)
        if obj is not None:
            # Upgrade rungs: Pallas attention variants, attempted only after
            # a number is banked; a faster result replaces the base value.
            for uargs, uenv, ucap in upgrades:
                remaining = budget - (time.monotonic() - t0) - 15
                if remaining < 180:
                    break
                uobj, uerr = _run_worker(
                    uargs, timeout=min(ucap, remaining), extra_env=uenv,
                )
                if uobj is None:
                    print(f"# upgrade rung {uenv} failed: {uerr}",
                          file=sys.stderr)
                elif uobj["value"] > obj["value"]:
                    print(f"# upgrade rung {uenv} wins: {uobj['value']} "
                          f"vs {obj['value']}", file=sys.stderr)
                    obj, args, extra_env = uobj, uargs, uenv
                else:
                    print(f"# upgrade rung {uenv} slower: {uobj['value']} "
                          f"vs {obj['value']}", file=sys.stderr)
            # Bonus rungs at the reference's larger operating points
            # (<=192k train / ~698k inference, configs/...contrastive.py:
            # 201,383) — purely opportunistic: failures never degrade the
            # headline 32k result, successes are recorded under "sizes".
            sizes = {args[-1]: obj["value"]}
            bonus = (["65536"] if kind == "train"
                     else ["65536", "131072", "196608"])
            for n in bonus:
                remaining = budget - (time.monotonic() - t0) - 15
                if remaining < 180:
                    break
                bobj, berr = _run_worker(
                    ["--worker", args[1], n],
                    timeout=min(900.0, remaining), extra_env=extra_env,
                )
                if bobj is None:
                    print(f"# bonus rung {n} failed: {berr}", file=sys.stderr)
                    break  # larger sizes won't fare better
                sizes[n] = bobj["value"]
            if len(sizes) > 1:
                obj["sizes"] = sizes
            print(json.dumps(obj))
            return
        last_err = err
        print(f"# attempt {args} failed: {err}", file=sys.stderr)
    fail(last_err)


if __name__ == "__main__":
    import sys

    argv = sys.argv[1:]
    if argv and argv[0] == "--worker":
        if argv[1] == "canary":
            _canary()
        elif argv[1] == "train":
            main_train(n_points=int(argv[2]) if len(argv) > 2 else 32768)
        elif argv[1] == "fwd-outdoor":
            main(n_points=int(argv[2]) if len(argv) > 2 else 32768,
                 outdoor=True)
        elif argv[1] == "fwd-outdoor-join":
            main(n_points=int(argv[2]) if len(argv) > 2 else 32768,
                 outdoor=True, outdoor_join=True)
        else:
            main(n_points=int(argv[2]) if len(argv) > 2 else 32768)
    elif argv and argv[0] == "train":
        if len(argv) > 1:  # explicit size: run in-process (manual use)
            main_train(n_points=int(argv[1]))
        else:
            _orchestrate("train")
    elif argv:
        main(n_points=int(argv[0]))
    else:
        _orchestrate("fwd")
