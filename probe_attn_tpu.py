"""Real-TPU probe: flash-window attention fwd + bwd compile & microbench.

New-kernel discipline (CLAUDE.md): interpret-mode tests can't catch Mosaic
layout errors, so any Pallas change gets a real-TPU grad compile probe
before landing.

Per config this records, in order (so a hang still leaves partial numbers):
  - Mosaic COMPILE seconds for fwd and fwd+bwd (the r3 finding was 814 s at
    the flagship signature - the number this probe exists to drive down),
  - max|err| vs the jnp reference,
  - amortized runtime per call for Pallas fwd / fwd+bwd AND the jnp
    reference fwd / fwd+bwd (adjudicates whether Pallas should be the
    default per signature).

The flagship C=768/H=16 (d=48, Cg=384, 8-way head unroll) is probed both
unpadded and head-padded to d=64 (SCENESPLAT_ATTN_PAD_HEAD dispatch: Cg=128,
2-way unroll - expected ~4x cheaper Mosaic compile for ~33% more MXU work).
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


def attn_padded(x, valid, h, d_real):
    """Head-pad d_real -> next pow2 and slice back (window_attention pad
    dispatch, inlined so the probe controls it independently of env)."""
    b, n, _, c = x.shape
    dp = 1 << (d_real - 1).bit_length()
    x6 = x.reshape(b, n, 3, h, d_real)
    x6 = jnp.pad(x6, ((0, 0), (0, 0), (0, 0), (0, 0), (0, dp - d_real)))
    o = flash_window_attention(
        x6.reshape(b, n, 3, h * dp), valid, 1024, h, d_real**-0.5
    )
    return o.reshape(b, n, h, dp)[..., :d_real].reshape(b, n, c)


# smallest-first: a pathological large-config compile must not block the
# small-config numbers (the r3 zero-output hang lost the whole window)
CONFIGS = [
    (4096, 192, 3, False),  # 192-lane full-C fallback tile (Mosaic)
    (4096, 256, 16, False),
    (32768 // SCALE, 32, 2, False),
    (32768 // SCALE, 768, 16, True),   # flagship PADDED first (cheap compile)
    (32768 // SCALE, 768, 16, False),  # flagship unpadded (the 814 s one)
]
only = os.environ.get("SCENESPLAT_PROBE_CONFIGS")  # e.g. "768p,768"
for (n, c, h, pad) in CONFIGS:
    tag = f"N={n} C={c} H={h}" + (" PAD64" if pad else "")
    if only:
        key = f"{c}p" if pad else f"{c}"
        if key not in only.split(","):
            continue
    print(f"[{time.strftime('%H:%M:%S')}] config {tag}...", flush=True)
    qkv = jnp.asarray(rng.normal(size=(1, n, 3, c)), jnp.bfloat16)
    valid = jnp.ones((1, n), bool)
    d = c // h

    def attn(x, v):
        if pad:
            return attn_padded(x, v, h, d)
        return flash_window_attention(x, v, 1024, h, None)

    def chain(kernel):
        def f(x, v):
            def body(i, x):
                o = kernel(x, v)
                return x * 0.5 + o[:, :, None, :] * 0.5

            return jnp.sum(
                jax.lax.fori_loop(0, R, body, x).astype(jnp.float32)
            )

        return f

    def grad_of(kernel):
        f = chain(kernel)
        return lambda x, v: jnp.sum(jax.grad(f)(x, v).astype(jnp.float32))

    fwd = jax.jit(chain(attn))
    bwd = jax.jit(grad_of(attn))

    # Mosaic compile cost, fwd then bwd (printed immediately: a bwd compile
    # blow-up must not lose the fwd number)
    t0 = time.perf_counter()
    fwd_c = fwd.lower(qkv, valid).compile()
    print(f"  compile fwd  {time.perf_counter() - t0:7.1f} s", flush=True)
    t0 = time.perf_counter()
    bwd_c = bwd.lower(qkv, valid).compile()
    print(f"  compile bwd  {time.perf_counter() - t0:7.1f} s", flush=True)

    # correctness vs jnp reference (single call, small tolerance bf16)
    o_pallas = jax.jit(attn)(qkv, valid)
    o_ref = jax.jit(
        lambda q, v: window_attention_reference(q, v, 1024, h, None)
    )(qkv, valid)
    err = float(
        jnp.max(jnp.abs(o_pallas.astype(jnp.float32) - o_ref.astype(jnp.float32)))
    )
    t_f = (timed(fwd_c, qkv, valid) - t_floor) / R
    gf = 4 * n * 1024 * c / t_f / 1e9
    print(
        f"{tag}: max|err|={err:.4f}  fwd {t_f*1e3:7.2f} ms "
        f"({gf:,.0f} GF/s)", flush=True
    )
    t_b = (timed(bwd_c, qkv, valid) - t_floor) / R
    print(f"  fwd+bwd {t_b*1e3:7.2f} ms", flush=True)

    # jnp reference at the same signature (is Pallas worth its compile?)
    if not pad:
        ref = lambda x, v: window_attention_reference(x, v, 1024, h, None)
        rf = jax.jit(chain(ref))
        rb = jax.jit(grad_of(ref))
        t_rf = (timed(rf, qkv, valid) - t_floor) / R
        print(f"  jnp fwd {t_rf*1e3:7.2f} ms", flush=True)
        t_rb = (timed(rb, qkv, valid) - t_floor) / R
        print(f"  jnp fwd+bwd {t_rb*1e3:7.2f} ms", flush=True)
print("OK")
