"""Real-TPU probe: pure-XLA radix sort vs lax.sort (compile + runtime).

Run when the tunnel answers (TPU_TODO.md item 9 companion). Measures, per
row length in the geometry range, fresh-compile wall time and amortized
runtime of:
  a) lax.sort 2-key 3-operand (the current sort_rows route)
  b) radix_sort_rows 1-key 2-payload (stable; bits=8 and bits=10/key_bits=30)

Decision: adopt SCENESPLAT_RADIX_SORT=1 if radix is runtime-competitive
(geometry has ~10 sort rows/step) AND compiles materially faster; else close
VERDICT item 4 with the measurements.
"""

import os
import time

import numpy as np

import scenesplat_tpu

scenesplat_tpu.setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scenesplat_tpu.ops.radix_sort import radix_sort_rows  # noqa: E402


def timed_compile(fn, *args):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    return c, time.perf_counter() - t0


def timed_run(compiled, args, reps=20):
    # chain through a data-dependent carry; host fetch = the only true sync
    out = compiled(*args)
    float(jnp.asarray(out[0][0, 0], jnp.float32))  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    s = float(jnp.asarray(out[0], jnp.float32).sum())
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(s)
    return dt


def main():
    rng = np.random.default_rng(0)
    cap = int(os.environ.get("SCENESPLAT_PROBE_N", 1 << 20))
    sizes = [n for n in (32768, 65536, 131072, 262144, 1 << 20) if n <= cap]
    if not sizes:
        sizes = [cap]
    for n in sizes:
        keys = jnp.asarray(
            rng.integers(0, 1 << 30, size=(1, n), dtype=np.uint32))
        p1 = jnp.asarray(rng.integers(0, n, size=(1, n), dtype=np.int32))
        p2 = jnp.asarray(rng.integers(0, n, size=(1, n), dtype=np.int32))

        def xla_sort(k, a, b):
            return jax.lax.sort((k, a.astype(jnp.uint32), b), dimension=-1,
                                num_keys=2, is_stable=False)

        def radix8(k, a, b):
            return radix_sort_rows((k, a, b), num_keys=1)

        def radix10(k, a, b):
            return radix_sort_rows((k, a, b), num_keys=1, bits=10,
                                   key_bits=30)

        for name, fn in (("xla2key", xla_sort), ("radix8", radix8),
                         ("radix10x3", radix10)):
            try:
                c, ct = timed_compile(fn, keys, p1, p2)
                rt = timed_run(c, (keys, p1, p2))
                print(f"n={n:>8} {name:10s} compile {ct:7.2f}s "
                      f"run {rt * 1e3:8.3f} ms")
            except Exception as e:
                print(f"n={n:>8} {name:10s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
