"""AOT executable cache (utils/aot_cache.py).

On CPU the disk round-trip is bypassed (XLA:CPU AOT entries are rejected at
load on this toolchain — CLAUDE.md), so these tests pin the key logic and
the compile-and-run path; the cross-process TPU round trip was adjudicated
on hardware (probe_aot_tpu.py, 2026-08-20)."""

import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.utils.aot_cache import cache_key, compile_cached


def _fn(x, y):
    return jnp.sum(x * 2.0 + y)


def test_compile_cached_runs():
    x = jnp.arange(8, dtype=jnp.float32)
    y = jnp.ones((8,), jnp.float32)
    exe = compile_cached(_fn, x, y, name="t")
    np.testing.assert_allclose(float(exe(x, y)), float(_fn(x, y)))


def test_cache_key_shape_sensitive():
    a = jnp.zeros((4,), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    c = jnp.zeros((4,), jnp.bfloat16)
    k1 = cache_key("n", (a,), {})
    assert k1 == cache_key("n", (jnp.ones((4,), jnp.float32),), {})  # values don't matter
    assert k1 != cache_key("n", (b,), {})  # shapes do
    assert k1 != cache_key("n", (c,), {})  # dtypes do
    assert k1 != cache_key("m", (a,), {})  # names do
    assert k1 != cache_key("n", (a,), {}, extra="cfg2")  # extra key does


def test_cache_key_pytree_sensitive():
    a = jnp.zeros((4,), jnp.float32)
    assert cache_key("n", ({"x": a},), {}) != cache_key("n", ({"y": a},), {})
