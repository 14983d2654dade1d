"""Real-TPU probe: does a compiled executable survive serialization across
processes on the tunneled runtime?

The tunnel's persistent compile cache skips programs containing custom
calls (Pallas kernels), so every process re-pays the Mosaic compile (814 s
at the flagship attention signature before head-padding). JAX's
``jax.experimental.serialize_executable`` pickles the POST-compile
executable; if ``deserialize_and_load`` works over the axon plugin, the
framework can keep its own on-disk executable cache for Pallas programs
and pay each Mosaic compile once EVER, not once per process.

Phase 1 (this process): compile a small-but-real Pallas attention program,
serialize, deserialize in-process, run both, compare, report sizes+times.
Phase 2: write the blob to /tmp and re-exec this script with
SCENESPLAT_AOT_CHILD=1, which ONLY deserializes and runs — the
cross-process answer that actually matters.
"""
import os
import pickle
import subprocess
import sys
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.pallas_attn import flash_window_attention

BLOB = "/tmp/aot_probe_blob.pkl"
N, C, H = 4096, 256, 16  # small real Mosaic program (compiles in seconds)

if jax.default_backend() != "tpu":
    print("non-TPU backend: serialize_executable needs the real runtime; "
          "smoke-checking imports only")
    from jax.experimental import serialize_executable  # noqa: F401

    print("OK (smoke)")
    sys.exit(0)

from jax.experimental.serialize_executable import (  # noqa: E402
    deserialize_and_load,
    serialize,
)


def make_inputs():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(1, N, 3, C)), jnp.bfloat16)
    valid = jnp.ones((1, N), bool)
    return qkv, valid


def fwd(qkv, valid):
    o = flash_window_attention(qkv, valid, 1024, H, None)
    return jnp.sum(o.astype(jnp.float32))


if os.environ.get("SCENESPLAT_AOT_CHILD") == "1":
    qkv, valid = make_inputs()
    t0 = time.perf_counter()
    with open(BLOB, "rb") as f:
        payload = pickle.load(f)
    compiled = deserialize_and_load(*payload)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    val = float(compiled(qkv, valid))
    t_run = time.perf_counter() - t0
    print(f"CHILD: load {t_load:.2f}s run {t_run:.3f}s value {val:.4f}",
          flush=True)
    sys.exit(0)

qkv, valid = make_inputs()
print(f"[{time.strftime('%H:%M:%S')}] compiling N={N} C={C} H={H}...",
      flush=True)
t0 = time.perf_counter()
compiled = jax.jit(fwd).lower(qkv, valid).compile()
t_compile = time.perf_counter() - t0
ref = float(compiled(qkv, valid))
print(f"compile {t_compile:.1f}s value {ref:.4f}", flush=True)

t0 = time.perf_counter()
payload = serialize(compiled)
blob = pickle.dumps(payload)
print(f"serialize {time.perf_counter() - t0:.2f}s, {len(blob)/1e6:.2f} MB",
      flush=True)

t0 = time.perf_counter()
compiled2 = deserialize_and_load(*pickle.loads(blob))
val2 = float(compiled2(qkv, valid))
print(f"in-process deserialize+run {time.perf_counter() - t0:.2f}s "
      f"value {val2:.4f} (match={abs(val2 - ref) < 1e-3})", flush=True)

with open(BLOB, "wb") as f:
    f.write(blob)
env = dict(os.environ, SCENESPLAT_AOT_CHILD="1")
print("spawning child process...", flush=True)
r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                   env=env, capture_output=True, text=True, timeout=600)
print(r.stdout.strip())
if r.returncode != 0:
    print(f"CHILD FAILED rc={r.returncode}: {(r.stderr or '')[-500:]}")
else:
    print("OK: cross-process executable reuse works on this runtime")
