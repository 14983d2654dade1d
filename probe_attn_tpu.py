"""Real-TPU probe: flash-window attention fwd + bwd compile & microbench.

New-kernel discipline (CLAUDE.md): interpret-mode tests can't catch Mosaic
layout errors, so any Pallas change gets a real-TPU grad compile probe
before landing.
"""
import os
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.pallas_attn import flash_window_attention
from scenesplat_tpu.ops.window_attention import window_attention_reference

R = int(os.environ.get("SCENESPLAT_PROBE_R", 8))
SCALE = int(os.environ.get("SCENESPLAT_PROBE_SCALE", 1))
rng = np.random.default_rng(0)

# CPU smoke: Pallas only runs in interpret mode off-TPU; enter the context
# so the script's logic (shapes, grads, comparisons) is still exercised.
if jax.default_backend() != "tpu":
    from jax.experimental.pallas import tpu as pltpu

    _interp = pltpu.force_tpu_interpret_mode()
    _interp.__enter__()
    print("non-TPU backend: running Pallas in interpret mode (smoke only)")


def timed(fn, *args, iters=6):
    # scalar host fetch = only true sync on the tunneled runtime
    # (block_until_ready is a no-op there; all timed fns return scalars)
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


@jax.jit
def noop(x):
    return x * 1.000001


print(f"[{time.strftime('%H:%M:%S')}] compiling floor noop...", flush=True)
t_floor = timed(noop, jnp.zeros((), jnp.float32))
print(f"[{time.strftime('%H:%M:%S')}] floor {t_floor*1e3:6.2f} ms", flush=True)

# smallest-first: a pathological large-config compile must not block the
# small-config numbers (the r3 zero-output hang lost the whole window)
for (n, c, h) in [(4096, 192, 3),  # 192-lane full-C fallback tile (Mosaic)
                  (4096, 256, 16),
                  (32768 // SCALE, 32, 2),
                  (32768 // SCALE, 768, 16)]:
    print(f"[{time.strftime('%H:%M:%S')}] config N={n} C={c} H={h}...",
          flush=True)
    qkv = jnp.asarray(rng.normal(size=(1, n, 3, c)), jnp.bfloat16)
    valid = jnp.ones((1, n), bool)

    @jax.jit
    def fwd(qkv, valid):
        def body(i, x):
            o = flash_window_attention(x, valid, 1024, h, None)
            return x * 0.5 + o[:, :, None, :] * 0.5

        return jnp.sum(jax.lax.fori_loop(0, R, body, qkv).astype(jnp.float32))

    @jax.jit
    def bwd(qkv, valid):
        def loss(x):
            def body(i, x):
                o = flash_window_attention(x, valid, 1024, h, None)
                return x * 0.5 + o[:, :, None, :] * 0.5

            return jnp.sum(
                jax.lax.fori_loop(0, R, body, x).astype(jnp.float32)
            )

        return jnp.sum(jax.grad(loss)(qkv).astype(jnp.float32))

    # correctness vs jnp reference (single call, small tolerance bf16)
    o_pallas = jax.jit(
        lambda q, v: flash_window_attention(q, v, 1024, h, None)
    )(qkv, valid)
    o_ref = jax.jit(
        lambda q, v: window_attention_reference(q, v, 1024, h, None)
    )(qkv, valid)
    err = float(
        jnp.max(jnp.abs(o_pallas.astype(jnp.float32) - o_ref.astype(jnp.float32)))
    )
    t_f = (timed(fwd, qkv, valid) - t_floor) / R
    gf = 4 * n * 1024 * c / t_f / 1e9
    # print fwd before attempting bwd so a bwd compile failure still
    # leaves the fwd numbers on record (the r3 VMEM-OOM lost them)
    print(
        f"N={n} C={c} H={h}: max|err|={err:.4f}  fwd {t_f*1e3:7.2f} ms "
        f"({gf:,.0f} GF/s)", flush=True
    )
    t_b = (timed(bwd, qkv, valid) - t_floor) / R
    print(f"  fwd+bwd {t_b*1e3:7.2f} ms", flush=True)
print("OK")
