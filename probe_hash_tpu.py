"""Conv-plan builder shoot-out on real TPU: merge-join vs dense voxel grid
vs bucketized hash grid (TPU_TODO item 13).

Times each builder amortized: R builds chained in one jitted fori_loop with a
data-dependent carry (the mask drops one carry-chosen point per iteration, so
builds cannot be collapsed), scalar output, host-fetch sync, dispatch floor
subtracted (CLAUDE.md timing rules — block_until_ready is a no-op on the
tunnel). Usage: python probe_hash_tpu.py [N].

Decision to record in TPU_TODO/CLAUDE.md:
- indoor (depth 10, extent 320 = flagship 6x6 m @ 2 cm): if hash ~= dense,
  hash can replace dense everywhere (no static extent config); if hash <<
  join, it becomes the default for every config without dense_extent.
- outdoor (depth 12, 2000 cells/axis): hash vs join is the unbounded-scene
  story (probe_outdoor.py then measures it end-to-end).
- Also note COMPILE seconds per builder at each size: the hash path's flat
  compile cost is the lever that may un-block fused whole-model geometry at
  N >= 64k (the XLA join-sort networks drove the compile-helper memory cap).
"""
import sys
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.hash_grid import build_subm_conv_plan_hash
from scenesplat_tpu.ops.subm_conv import (
    build_subm_conv_plan,
    build_subm_conv_plan_dense,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
R = 8
rng = np.random.default_rng(0)


def timed(fn, *args, iters=5):
    t_compile = time.perf_counter()
    float(fn(*args))  # host fetch = true sync
    t_compile = time.perf_counter() - t_compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), t_compile


@jax.jit
def noop(x):
    return x * 1.000001


t_floor, _ = timed(noop, jnp.zeros((), jnp.float32))
print(f"dispatch floor: {t_floor*1e3:7.2f} ms")


def make_scene(extent):
    """[1, N, 3] unique voxels (GridSample contract)."""
    cells = np.unique(rng.integers(0, extent**3, 4 * N, dtype=np.int64))[:N]
    assert len(cells) == N
    gc = np.stack(np.unravel_index(cells, (extent,) * 3), -1).astype(np.int32)
    return jnp.asarray(gc[None]), jnp.ones((1, N), bool)


def bench(name, build_fn, gc, mask, k, chain=True):
    # chain=True: R builds in one fori program (flat-compile builders only:
    # hash/dense). chain=False: ONE build per program, R burst dispatches,
    # sync once — used for the join builder, whose R-chained fori compile
    # is pathological (the 2026-08-20 run burned a 45-min compile and
    # rc=124'd before its first number; CLAUDE.md's 125-offset-fusion
    # warning applies to the chained form). Burst numbers are upper bounds
    # (residual per-dispatch tunnel overhead that chaining would amortize).
    if chain:
        @jax.jit
        def run(gc, mask):
            def body(i, carry):
                drop, acc = carry
                iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
                m = mask & (iota != drop)
                plan = build_fn(gc, m)
                s = jnp.sum(
                    jnp.where(plan.neighbor_valid, plan.neighbor_index, 0)
                    .astype(jnp.float32)
                )
                return (jnp.mod(s, np.float32(N)).astype(jnp.int32), acc + s)

            _, acc = jax.lax.fori_loop(
                0, R, body, (jnp.int32(0), jnp.float32(0.0))
            )
            return acc
    else:
        @jax.jit
        def one(gc, mask):
            plan = build_fn(gc, mask)
            return jnp.sum(
                jnp.where(plan.neighbor_valid, plan.neighbor_index, 0)
                .astype(jnp.float32)
            )

        def run(gc, mask):
            accs = [one(gc, mask) for _ in range(R)]
            return jnp.sum(jnp.stack(accs))

    try:
        t, t_compile = timed(run, gc, mask)
    except Exception as e:  # Mosaic/XLA rejection or helper SIGKILL
        print(f"{name:24s} k={k}: FAILED {type(e).__name__}: {e}"[:200])
        return
    t = (t - t_floor) / R
    tag = "" if chain else " [burst: upper bound]"
    print(f"{name:24s} k={k}: {t*1e3:8.2f} ms/build   "
          f"(compile {t_compile:6.1f} s){tag}")


for label, extent, depth, dense_ok in (
    ("indoor 320^3 d10", 320, 10, True),
    ("outdoor 2000^3 d12", 2000, 12, False),
):
    print(f"\n== {label}, N={N} ==")
    gc, mask = make_scene(extent)
    # flat-compile builders first (chained); the join builder LAST and
    # un-chained so its compile cannot eat the window before the new
    # builders report
    for k in (5, 3):
        bench(
            f"hash ({label})",
            lambda g, m, k=k, d=depth: build_subm_conv_plan_hash(
                g, m, kernel_size=k, depth=d
            ),
            gc, mask, k,
        )
        if dense_ok:
            bench(
                f"dense ({label})",
                lambda g, m, k=k, e=extent: build_subm_conv_plan_dense(
                    g, m, kernel_size=k, extent=(e, e, e)
                ),
                gc, mask, k,
            )
    for k in (5, 3):
        bench(
            f"join ({label})",
            lambda g, m, k=k, d=depth: build_subm_conv_plan(
                g, m, kernel_size=k, depth=d
            ),
            gc, mask, k, chain=False,
        )
