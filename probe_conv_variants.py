"""Real-TPU probe: subm_conv apply variants at dec0 shapes (N=32k, C=768).

Current form: 27x [gather -> matmul -> accumulate] unrolled. Measured
88 TF/s (11.86 ms) before the masked-fill gather change. Variants:
  a) current (masked-fill gathers)
  b) pair-grouped: concat 2 gathered taps -> [N, 2C] x [2C, C] matmul
     (13+1 matmuls, contraction 1536; fewer, larger MXU ops)
  c) triple-grouped: [N, 3C] x [3C, C] (9 matmuls)
  d) bf16 accumulation (accumulate in bf16 instead of fp32)
"""
import os
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.subm_conv import SubMConvPlan, subm_conv_apply, _gather_rows_masked

R = int(os.environ.get("SCENESPLAT_PROBE_R", 8))
SCALE = int(os.environ.get("SCENESPLAT_PROBE_SCALE", 1))
rng = np.random.default_rng(0)


def timed(fn, *args, iters=5):
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


t_floor = timed(noop, jnp.zeros((), jnp.float32))
print(f"floor {t_floor*1e3:6.2f} ms", flush=True)

def apply_single_gather(feat, plan, w):
    """One [B, K3*N] fused gather, then per-tap matmuls on slices."""
    b, n = feat.shape[:2]
    k3 = w.shape[0]
    flat = feat.reshape(b * n, feat.shape[2])
    base = jax.lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0) * n
    idx = jnp.where(
        plan.neighbor_valid, plan.neighbor_index.astype(jnp.int32) + base,
        b * n,
    )  # [B, K3, N]
    g = jnp.take(flat, idx.reshape(-1), axis=0, mode="fill", fill_value=0)
    g = g.reshape(b, k3, n, feat.shape[2])
    out = jnp.einsum("bknc,kcd->bnd", g, w, preferred_element_type=jnp.float32)
    return out.astype(feat.dtype)


def chain(apply_fn):
    @jax.jit
    def run(feat, nbr, valid, w):
        plan = SubMConvPlan(nbr, valid, 3)

        def body(i, f):
            o = apply_fn(f, plan, w)
            return f * 0.5 + o.astype(f.dtype) * 0.01

        f = jax.lax.fori_loop(0, R, body, feat)
        return jnp.sum(f.astype(jnp.float32))

    return run


def apply_grouped(group):
    def fn(feat, plan, w):
        k3 = w.shape[0]
        out = None
        for lo in range(0, k3, group):
            hi = min(lo + group, k3)
            gs = [
                _gather_rows_masked(
                    feat, plan.neighbor_index[:, k], plan.neighbor_valid[:, k]
                )
                for k in range(lo, hi)
            ]
            g = jnp.concatenate(gs, axis=-1)  # [B, N, g*C]
            wcat = w[lo:hi].reshape((hi - lo) * w.shape[1], w.shape[2])
            term = jnp.einsum(
                "bnc,cd->bnd", g, wcat, preferred_element_type=jnp.float32
            )
            out = term if out is None else out + term
        return out.astype(feat.dtype)

    return fn


def apply_bf16acc(feat, plan, w):
    k3 = w.shape[0]
    out = None
    for k in range(k3):
        g = _gather_rows_masked(
            feat, plan.neighbor_index[:, k], plan.neighbor_valid[:, k]
        )
        term = jnp.einsum("bnc,cd->bnd", g, w[k])
        out = term if out is None else out + term
    return out


variants = [
    ("current (fp32 acc)", subm_conv_apply),
    ("pair-grouped", apply_grouped(2)),
    ("triple-grouped", apply_grouped(3)),
    ("bf16 acc", apply_bf16acc),
    ("single fused gather", apply_single_gather),
]

for (N, C) in [(32768 // SCALE, 768), (32768 // SCALE, 32)]:
    K3 = 27
    feat = jnp.asarray(rng.normal(size=(1, N, C)), jnp.bfloat16)
    nbr = jnp.asarray(rng.integers(0, N, size=(1, K3, N)), jnp.int32)
    valid = jnp.asarray(rng.random((1, K3, N)) > 0.2)
    w = jnp.asarray(rng.normal(size=(K3, C, C)) * 0.02, jnp.bfloat16)
    flops = 2 * N * C * C * K3
    gbytes = K3 * N * C * 2  # gathered feature bytes
    print(f"--- N={N} C={C}", flush=True)
    for name, fn in variants:
        try:
            t = (timed(chain(fn), feat, nbr, valid, w) - t_floor) / R
            print(
                f"{name:22s}: {t*1e3:7.2f} ms  ({flops/t/1e12:6.1f} TF/s, "
                f"{gbytes/t/1e9:6.1f} GB/s gather)", flush=True
            )
        except Exception as e:
            print(f"{name:22s}: FAILED {type(e).__name__}: {e}", flush=True)
print("OK")
