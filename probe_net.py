"""Network-component microbench at flagship shapes: where do the 145 ms go?

Each component is timed amortized: R applications chained inside one jitted
program via fori_loop (data-dependent carry), scalar output. Wall time / R,
with a no-op dispatch-floor program subtracted.
"""
import functools
import os
import sys
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.subm_conv import SubMConvPlan, subm_conv_apply
from scenesplat_tpu.ops.window_attention import window_attention
from scenesplat_tpu.ops.serialization import take_along_points

R = int(os.environ.get("SCENESPLAT_PROBE_R", 32))
SCALE = int(os.environ.get("SCENESPLAT_PROBE_SCALE", 1))  # divide stage N for CPU smoke
DTYPE = jnp.bfloat16

rng = np.random.default_rng(0)


def timed(fn, *args, iters=6):
    float(fn(*args))  # host fetch = true sync (block_until_ready is a no-op)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def noop(x):
    return x * 1.000001


x0 = jnp.zeros((), jnp.float32)
t_floor = timed(noop, x0)
print(f"dispatch floor:        {t_floor*1e3:7.2f} ms")


def bench_conv(n, c, k3=27):
    feat = jnp.asarray(rng.normal(size=(1, n, c)), DTYPE)
    nbr = jnp.asarray(rng.integers(0, n, size=(1, k3, n)), jnp.int32)
    valid = jnp.asarray(rng.random((1, k3, n)) > 0.2)
    w = jnp.asarray(rng.normal(size=(k3, c, c)) * 0.02, DTYPE)
    plan = SubMConvPlan(nbr, valid, 3)

    @jax.jit
    def run(feat, nbr, valid, w):
        plan = SubMConvPlan(nbr, valid, 3)

        def body(i, f):
            return subm_conv_apply(f, plan, w) * 0.5 + f * 0.5

        return jnp.sum(jax.lax.fori_loop(0, R, body, feat).astype(jnp.float32))

    t = (timed(run, feat, nbr, valid, w) - t_floor) / R
    gf = 2 * k3 * n * c * c / t / 1e9
    print(f"conv27  N={n:6d} C={c:4d}: {t*1e3:7.2f} ms  ({gf:,.0f} GFLOP/s)")
    return t


def bench_attn(n, c, h, k=1024):
    k = min(k, n)  # CPU smoke shrinks n below the flagship patch size
    qkv = jnp.asarray(rng.normal(size=(1, n, 3, c)), DTYPE)
    valid = jnp.ones((1, n), bool)

    @jax.jit
    def run(qkv, valid):
        def body(i, qkv):
            out = window_attention(qkv.reshape(1, n, 3, c), valid,
                                   patch_size=k, num_heads=h)
            return qkv * 0.5 + out[:, :, None, :] * 0.5

        return jnp.sum(jax.lax.fori_loop(0, R, body, qkv).astype(jnp.float32))

    t = (timed(run, qkv, valid) - t_floor) / R
    gf = 4 * n * k * c / t / 1e9
    print(f"attn    N={n:6d} C={c:4d} H={h:3d}: {t*1e3:7.2f} ms  ({gf:,.0f} GFLOP/s)")
    return t


def bench_gather(n, c):
    feat = jnp.asarray(rng.normal(size=(1, n, c)), DTYPE)
    perm = jnp.asarray(rng.permutation(n)[None], jnp.int32)

    @jax.jit
    def run(feat, perm):
        def body(i, f):
            return take_along_points(f, perm)

        return jnp.sum(jax.lax.fori_loop(0, R, body, feat).astype(jnp.float32))

    t = (timed(run, feat, perm) - t_floor) / R
    gb = n * c * 2 / t / 1e9
    print(f"gather  N={n:6d} C={c:4d}: {t*1e3:7.2f} ms  ({gb:,.1f} GB/s)")
    return t


def bench_mlp(n, c):
    feat = jnp.asarray(rng.normal(size=(1, n, c)), DTYPE)
    w1 = jnp.asarray(rng.normal(size=(c, 4 * c)) * 0.02, DTYPE)
    w2 = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.02, DTYPE)

    @jax.jit
    def run(feat, w1, w2):
        def body(i, f):
            h = jax.nn.gelu(jnp.einsum("bnc,cd->bnd", f, w1,
                                       preferred_element_type=jnp.float32).astype(DTYPE))
            return jnp.einsum("bnd,dc->bnc", h, w2,
                              preferred_element_type=jnp.float32).astype(DTYPE)

        return jnp.sum(jax.lax.fori_loop(0, R, body, feat).astype(jnp.float32))

    t = (timed(run, feat, w1, w2) - t_floor) / R
    gf = 2 * 2 * 4 * n * c * c / t / 1e9
    print(f"mlp     N={n:6d} C={c:4d}: {t*1e3:7.2f} ms  ({gf:,.0f} GFLOP/s)")
    return t


def bench_ln(n, c):
    from scenesplat_tpu.models.norm import LayerNorm

    mod = LayerNorm(c, dtype=DTYPE)
    feat = jnp.asarray(rng.normal(size=(1, n, c)), DTYPE)
    params = mod.init(jax.random.PRNGKey(0), feat)

    @jax.jit
    def run(params, feat):
        def body(i, f):
            return mod.apply(params, f)

        return jnp.sum(jax.lax.fori_loop(0, R, body, feat).astype(jnp.float32))

    t = (timed(run, params, feat) - t_floor) / R
    print(f"ln      N={n:6d} C={c:4d}: {t*1e3:7.2f} ms")
    return t


STAGES = [
    ("enc0", 32768, 32, 2, 2),
    ("enc1", 16384, 64, 4, 2),
    ("enc2", 8192, 128, 8, 2),
    ("enc3", 4096, 256, 16, 6),
    ("dec2", 8192, 256, 16, 2),
    ("dec1", 16384, 512, 16, 2),
    ("dec0", 32768, 768, 16, 2),
]

which = sys.argv[1] if len(sys.argv) > 1 else "all"
total = {}
for name, n, c, h, depth in STAGES:
    n = max(n // SCALE, 128)
    print(f"--- {name} x{depth}")
    tc = bench_conv(n, c) if which in ("all", "conv") else 0
    ta = bench_attn(n, c, h) if which in ("all", "attn") else 0
    tg = bench_gather(n, c) * 2 if which in ("all", "gather") else 0
    tm = bench_mlp(n, c) if which in ("all", "mlp") else 0
    tl = bench_ln(n, c) * 3 if which in ("all", "ln") else 0
    total[name] = depth * (tc + ta + tg + tm + tl)

print("=== estimated per-stage block totals")
for name, t in total.items():
    print(f"{name}: {t*1e3:7.2f} ms")
print(f"sum: {sum(total.values())*1e3:7.2f} ms")
