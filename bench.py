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

Measurement methodology (CLAUDE.md): iterations are CHAINED inside one
jitted ``lax.fori_loop`` with a data-dependent carry and synced by a single
scalar host fetch, then divided by the rep count after subtracting a
noop-program floor. On the tunneled runtime each *dispatch* costs ~100 ms
of host/RPC marshalling that does NOT pipeline away (measured 2026-08-20:
dispatch-loop 148.7 ms/iter vs 25.5 ms/iter chained for the identical
program) — that overhead is tunnel infrastructure, not device throughput,
and direct-attached TPUs don't pay it.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _timed_scalar(fn, *args, reps=5):
    """Median wall time of ``float(fn(*args))`` — the scalar host fetch is
    the only true completion sync on the tunneled runtime."""
    float(fn(*args))  # warmup / ensure compiled
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _noop_floor():
    import jax
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x * 1.000001)
    return _timed_scalar(noop, jnp.zeros((), jnp.float32))


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
    # Host-built stem plan (native/host_ops.cpp:subm_dense_plan): the k=5
    # stem plan is a pure function of grid_coord, built by the data-loader
    # workers in the real pipeline (transforms.HostConvPlan) and shipped as
    # a batch input — ~71 ms of device scalar-gather time moves off the
    # critical path (measured r5: fused fwd 207 -> 145.5 ms at 32k). The
    # build is timed to stderr for the overlap-honesty record.
    stem_plan = None
    if backbone.get("dense_extent") and not os.environ.get(
        "SCENESPLAT_NO_HOST_PLAN"
    ):
        import sys as _sys

        from scenesplat_tpu import native
        from scenesplat_tpu.models.ptv3 import stem_plan_from_batch

        native.subm_dense_plan(  # warm (allocations, .so load)
            grid_coord[0], mask[0], 5, backbone["dense_extent"]
        )
        t0 = time.perf_counter()
        nbrs, valids = zip(*(
            native.subm_dense_plan(
                grid_coord[i], mask[i], 5, backbone["dense_extent"]
            )
            for i in range(batch)
        ))
        print(
            f"# host stem-plan build: "
            f"{(time.perf_counter() - t0) * 1e3:.0f} ms "
            f"({batch}x{n_points}, 1 host core)",
            file=_sys.stderr,
        )
        stem_plan = stem_plan_from_batch(
            {"stem_nbr": np.stack(nbrs), "stem_valid": np.stack(valids)}
        )
    # Staged geometry (one jitted program per construction step) compiles
    # within the tunneled compile helper's memory cap at N >= 64k where the
    # fused single-program geometry gets SIGKILLed; below that one fused
    # geometry+network program wins (single dispatch, XLA overlaps the int
    # geometry pipeline with the network matmuls).
    if staged is None:
        if os.environ.get("SCENESPLAT_BENCH_STAGED") is not None:
            staged = os.environ["SCENESPLAT_BENCH_STAGED"] == "1"
        else:
            # with host-built stem plans the fused program compiles and WINS
            # at 65k (252.6k vs 216.5k staged, 2026-08-21); at 131k the
            # fused compile ran >40 min on the helper — staged above 65k
            staged = batch * n_points > 65536
    if not staged:
        variables = jax.jit(
            lambda p: model.init(
                {"params": jax.random.PRNGKey(0),
                 "shuffle": jax.random.PRNGKey(1)},
                p, train=False,
            )
        )(point)

        @jax.jit
        def fwd_chain(v, p, sp):
            # geometry + network per rep; the feat/coord carries make every
            # rep data-dependent so XLA can neither hoist the geometry nor
            # run reps concurrently — wall/iters = true device time. The
            # host-built stem plan (sp) is a loop-constant INPUT, like the
            # params: in the real pipeline it arrives with the batch.
            def body(i, carry):
                f, c = carry
                # z is always 0 but data-dependent (no constant folding), so
                # the geometry — which consumes only grid_coord/mask — stays
                # inside the loop instead of being hoisted by while-LICM
                z = (c * 1e-30).astype(p.grid_coord.dtype)
                pt = p.replace(
                    feat=f, coord=p.coord + c,
                    grid_coord=p.grid_coord + z,
                )
                if sp is not None:
                    gg = bb_module.build_geometry(pt, stem_plan=sp)
                    out = model.apply(v, pt, train=False, geometry=gg).feat
                else:
                    out = model.apply(v, pt, train=False).feat
                s = jnp.sum(out.astype(jnp.float32))
                f2 = f * 0.5 + out[..., : f.shape[-1]].astype(f.dtype) * 0.01
                return (f2, c + s * 1e-30)

            f, c = jax.lax.fori_loop(
                0, iters, body,
                (p.feat, jnp.zeros((), p.coord.dtype)),
            )
            return jnp.sum(f.astype(jnp.float32)) + c

        floor = _noop_floor()
        # clamp: at tiny N the chain time can sit within noise of the noop
        # floor; never emit a zero/negative/infinite throughput (ADVICE r4)
        dt = max(
            (_timed_scalar(fwd_chain, variables, point, stem_plan) - floor)
            / iters,
            1e-6,
        )
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
    if staged:
        def geom_fn(p):
            return bb_module.build_geometry_staged(p, stem_plan=stem_plan)
    else:
        _geom_jit = jax.jit(
            lambda p, sp: bb_module.build_geometry(p, stem_plan=sp)
        )

        def geom_fn(p):
            return _geom_jit(p, stem_plan)
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
    def net_chain(v, p, g):
        # chained reps (CLAUDE.md): feat carry serializes reps on device
        def body(i, f):
            pt = p.replace(feat=f)
            out = model.apply(v, pt, train=False, geometry=g).feat
            return f * 0.5 + out[..., : p.feat.shape[-1]].astype(f.dtype) * 0.01

        f = jax.lax.fori_loop(0, iters, body, p.feat)
        return jnp.sum(f.astype(jnp.float32))

    floor = _noop_floor()
    t_net = max(
        (_timed_scalar(net_chain, variables, point, geom) - floor) / iters,
        1e-6,
    )

    # staged geometry: separate executables per step, so reps can't be
    # fused into one fori program; dispatch `iters` rebuilds back-to-back
    # and sync once on the last leaf (in-order device execution) — an upper
    # bound that still amortizes most per-dispatch tunnel overhead
    def geom_burst():
        last = None
        for _ in range(iters):
            last = geom_fn(point)
        leaf = [x for x in jax.tree_util.tree_leaves(last)
                if hasattr(x, "astype")][-1]
        return jnp.sum(leaf.astype(jnp.float32))

    t_geom = max(0.0, (_timed_scalar(geom_burst) - floor) / iters)
    gps = batch * n_points / (t_net + t_geom)
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
    train_step = make_train_step(model, criteria, tx, task="lang")

    bb_module = PointTransformerV3(
        **{k: v for k, v in backbone.items() if k != "type"}
    )
    point = point_from_batch(batch_dict)

    # host-built stem plan, as in main(): the train pipeline's loader
    # workers ship it with every batch (transforms.HostConvPlan)
    stem_plan = None
    if backbone.get("dense_extent") and not os.environ.get(
        "SCENESPLAT_NO_HOST_PLAN"
    ):
        from scenesplat_tpu import native
        from scenesplat_tpu.models.ptv3 import stem_plan_from_batch

        nbrs, valids = zip(*(
            native.subm_dense_plan(
                grid_coord[i], mask[i], 5, backbone["dense_extent"]
            )
            for i in range(batch)
        ))
        stem_plan = stem_plan_from_batch(
            {"stem_nbr": np.stack(nbrs), "stem_valid": np.stack(valids)}
        )

    # geometry must be its own program (fwd+bwd+geometry fused exceeds the
    # tunnel compile memory cap at 32k) but below 64k the single fused
    # geometry program beats the staged per-step programs (fewer dispatches)
    if batch * n_points < 65536:
        geom_jit = jax.jit(
            lambda p, rng, sp: bb_module.build_geometry(
                p, shuffle_rng=rng, stem_plan=sp
            )
        )

        def geom(i):
            return geom_jit(point, jax.random.PRNGKey(i), stem_plan)
    else:
        def geom(i):
            return bb_module.build_geometry_staged(
                point, shuffle_rng=jax.random.PRNGKey(i),
                stem_plan=stem_plan,
            )

    # Chained-fori methodology (CLAUDE.md / module docstring): the state
    # carry serializes steps on device inside ONE program; a single scalar
    # fetch syncs. Geometry (its own program) is timed separately the same
    # way and added.
    def step_chain(st, batch, g):
        # the chain also carries iteration 0's loss out, so the finite-loss
        # sanity check needs no standalone jit(train_step) compile — the
        # train program embeds Pallas custom calls the tunnel never
        # persist-caches, so a second compile would double the ~20 min cold
        # cost (ADVICE r4)
        def body(i, carry):
            s, l0 = carry
            s2, m = train_step(s, batch, g)
            l0 = jnp.where(i == 0, m["loss"], l0)
            return s2, l0

        st, loss0 = jax.lax.fori_loop(
            0, iters, body, (st, jnp.asarray(jnp.nan, jnp.float32))
        )
        return st, jnp.asarray(st.step, jnp.float32), loss0

    g0 = geom(0)
    # AOT executable cache: the train chain embeds Pallas custom calls the
    # tunnel never persist-caches (~25 min compile per process at 32k);
    # serialize_executable reuse was adjudicated OK on this runtime
    # (probe_aot_tpu, 2026-08-20) so the compile is paid once EVER
    from scenesplat_tpu.utils.aot_cache import compile_cached

    step_chain = compile_cached(
        step_chain, state, batch_dict, g0,
        name=f"bench-train-chain-{batch}x{n_points}x{iters}",
    )
    new_state, stepval, loss0 = step_chain(state, batch_dict, g0)
    float(stepval)  # warmup
    assert np.isfinite(float(loss0))
    # free the warmup's TrainState copy before the timed run: both copies
    # plus the chain workspace exceeded HBM at 32k (OOM at the timed fetch,
    # 2026-08-21)
    del new_state, stepval, loss0

    floor = _noop_floor()
    t0 = time.perf_counter()
    _, stepval, _ = step_chain(state, batch_dict, g0)
    sv = float(stepval)  # scalar fetch = the only true sync (CLAUDE.md)
    t_step = max((time.perf_counter() - t0 - floor) / iters, 1e-6)
    assert np.isfinite(sv)

    def geom_burst():
        last = None
        for i in range(iters):
            last = geom(100 + i)
        leaf = [x for x in jax.tree_util.tree_leaves(last)
                if hasattr(x, "astype")][-1]
        return jnp.sum(leaf.astype(jnp.float32))

    t_geom = max(0.0, (_timed_scalar(geom_burst) - floor) / iters)
    gps = batch * n_points / (t_step + t_geom)
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
        "SCENESPLAT_BENCH_BUDGET", "3600" if kind == "train" else "2400"))
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
        # fallback rung: no-pallas NEEDS masked-exp off — the jnp dec0
        # attention bwd residuals put the 16k step 351 MB over HBM with it
        ladder = [
            (["--worker", "train", "32768"], None, 2400.0),
            (["--worker", "train", "16384"],
             dict(no_pallas, SCENESPLAT_MASKED_EXP="0"), 900.0),
        ]
        upgrades = []
    else:
        # Rung 1 is the DEFAULT env (hybrid pad64 Pallas + masked-exp +
        # host stem plan): since r5 it is both the fastest measured config
        # (265.5k vs 240.4k no-pallas @32k) and the one whose programs are
        # warm in the tunnel cache. no-pallas is the fallback for Mosaic
        # regressions, not the opener (r4's rationale — an 814 s cold
        # Mosaic compile — died with head-padding).
        ladder = [
            (["--worker", "fwd", "32768"], None, 1200.0),
            (["--worker", "fwd", "32768"], no_pallas, 900.0),
            (["--worker", "fwd", "16384"], no_pallas, 900.0),
        ]
        upgrades = []
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
            # Train rung (VERDICT r4 item 4: the driver scoreboard sees a
            # train number). The cheap reliable variant: 16k no-Pallas is
            # pure-XLA (tunnel persist-caches it; jnp-attention bwd fits
            # HBM below 32k), so warm runs cost minutes, not the ~25 min
            # uncacheable Pallas hybrid compile.
            if kind == "fwd":
                remaining = budget - (time.monotonic() - t0) - 15
                if remaining >= 300:
                    # default env (hybrid Pallas): memory-light — the
                    # all-jnp dec0 attention bwd OOMs even at 16k with
                    # masked-exp residuals (16.09/15.75G, 2026-08-21)
                    tobj, terr = _run_worker(
                        ["--worker", "train", "16384"],
                        timeout=min(900.0, remaining), extra_env=None,
                    )
                    if tobj is not None:
                        obj["train"] = tobj["value"]
                    else:
                        print(f"# train rung failed: {terr}", file=sys.stderr)
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
