"""Pure-XLA LSD radix sort vs lax.sort (stable)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from scenesplat_tpu.ops.radix_sort import radix_sort_rows  # noqa: E402


def _ref(operands, num_keys):
    return jax.lax.sort(
        tuple(operands), dimension=-1, num_keys=num_keys, is_stable=True
    )


@pytest.mark.parametrize("num_keys,num_payloads", [(1, 0), (1, 2), (2, 1)])
def test_matches_stable_lax_sort(num_keys, num_payloads):
    rng = np.random.default_rng(0)
    b, n = 3, 517
    ops = [
        jnp.asarray(rng.integers(0, 2**32, size=(b, n), dtype=np.uint32))
        for _ in range(num_keys)
    ]
    # few distinct keys -> many ties: exercises stability
    ops[0] = jnp.asarray(
        rng.integers(0, 7, size=(b, n), dtype=np.uint32)
    )
    for _ in range(num_payloads):
        ops.append(jnp.asarray(
            rng.integers(0, 2**31, size=(b, n), dtype=np.int32)
        ))
    out = radix_sort_rows(tuple(ops), num_keys=num_keys)
    ref = _ref(ops, num_keys)
    for o, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_sentinels_sort_last():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 30, size=(2, 100), dtype=np.uint32)
    keys[0, :10] = 0xFFFFFFFE  # mask sentinels
    payload = np.arange(200, dtype=np.int32).reshape(2, 100)
    k, p = radix_sort_rows((jnp.asarray(keys), jnp.asarray(payload)),
                           num_keys=1)
    np.testing.assert_array_equal(np.asarray(k), np.sort(keys, axis=-1))
    assert (np.asarray(k)[0, -10:] == 0xFFFFFFFE).all()


def test_narrow_key_bits():
    """key_bits=30 (packed codes): 4 passes instead of 4 at bits=8... same
    result, fewer shifts used."""
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 1 << 30, size=(1, 256), dtype=np.uint32)
    payload = rng.integers(0, 1000, size=(1, 256), dtype=np.int32)
    a = radix_sort_rows((jnp.asarray(keys), jnp.asarray(payload)),
                        num_keys=1, key_bits=30, bits=10)
    b = _ref((jnp.asarray(keys), jnp.asarray(payload)), 1)
    for o, r in zip(a, b):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_1d_and_dtype_roundtrip():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**16, size=300, dtype=np.uint32)
    out, = radix_sort_rows((jnp.asarray(keys),), num_keys=1)
    np.testing.assert_array_equal(np.asarray(out), np.sort(keys))
    assert out.dtype == jnp.uint32 and out.shape == (300,)
