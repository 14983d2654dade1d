"""Pallas bitonic sort vs lax.sort golden (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenesplat_tpu.ops.pallas_sort import bitonic_sort


@pytest.mark.parametrize("n", [1000, 1024, 4096, 5000])
def test_single_key_with_payload(rng, n):
    k = rng.integers(0, 2**31, (3, n)).astype(np.uint32)
    p = np.tile(np.arange(n, dtype=np.int32), (3, 1))
    sk, sp = bitonic_sort([jnp.asarray(k), jnp.asarray(p)], num_keys=1,
                          interpret=True)
    ref = np.sort(k, axis=-1)
    assert (np.asarray(sk) == ref).all()
    # payload is the argsort: gathering keys by it reproduces the sorted keys
    assert (np.take_along_axis(k, np.asarray(sp), -1) == ref).all()


def test_two_key_lexicographic(rng):
    hi = rng.integers(0, 4, (2, 2048)).astype(np.uint32)
    lo = rng.integers(0, 2**24, (2, 2048)).astype(np.uint32)
    p = np.tile(np.arange(2048, dtype=np.int32), (2, 1))
    shi, slo, _ = bitonic_sort(
        [jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(p)], num_keys=2,
        interpret=True,
    )
    comb = hi.astype(np.uint64) << np.uint64(32) | lo
    got = np.asarray(shi).astype(np.uint64) << np.uint64(32) | np.asarray(slo)
    assert (got == np.sort(comb, axis=-1)).all()


def test_duplicate_keys_and_1d(rng):
    k = rng.integers(0, 8, 3000).astype(np.uint32)  # heavy ties
    p = np.arange(3000, dtype=np.int32)
    sk, sp = bitonic_sort([jnp.asarray(k), jnp.asarray(p)], num_keys=1,
                          interpret=True)
    assert (np.asarray(sk) == np.sort(k)).all()
    # permutation property: payload is a bijection
    assert (np.sort(np.asarray(sp)) == p).all()


def test_matches_lax_sort_three_operands(rng):
    key = rng.integers(0, 2**20, (2, 1024)).astype(np.uint32)
    a = rng.integers(0, 100, (2, 1024)).astype(np.int32)
    b = np.tile(np.arange(1024, dtype=np.int32), (2, 1))
    sk, sa, sb = bitonic_sort(
        [jnp.asarray(key), jnp.asarray(a), jnp.asarray(b)], num_keys=1,
        interpret=True,
    )
    rk, _, _ = jax.lax.sort(
        (jnp.asarray(key), jnp.asarray(a), jnp.asarray(b)), dimension=-1,
        num_keys=1, is_stable=False,
    )
    assert (np.asarray(sk) == np.asarray(rk)).all()
    # (payload order may differ under ties; check the key-payload pairing)
    order = np.asarray(sb)
    assert (np.take_along_axis(key, order, -1) == np.asarray(sk)).all()
    assert (np.take_along_axis(a, order, -1) == np.asarray(sa)).all()


def test_bitops_under_forced_pallas_sort(rng, monkeypatch):
    """Exercise the bitops merge-join + serialization sorts through the
    Pallas kernel (interpret mode) and compare against the XLA path."""
    monkeypatch.setenv("SCENESPLAT_PALLAS_SORT", "1")
    from scenesplat_tpu.ops import bitops

    b, n, m = 2, 512, 300
    data_lo = np.sort(
        rng.choice(2**20, size=(b, n), replace=False).astype(np.uint32), axis=-1
    )
    data_hi = np.zeros_like(data_lo)
    # mark a tail as sentinel (padding) rows
    data_hi[:, -40:] = np.uint32(0x7FFFFFFF)
    qlo = rng.integers(0, 2**20, (b, m)).astype(np.uint32)
    qlo[:, :50] = data_lo[:, :50]  # guaranteed hits
    qhi = np.zeros_like(qlo)

    args = (jnp.asarray(data_hi), jnp.asarray(data_lo), jnp.asarray(qhi),
            jnp.asarray(qlo))
    pay_p, found_p = bitops.lookup_pair_batched(*args, packed=True)
    monkeypatch.setenv("SCENESPLAT_PALLAS_SORT", "0")
    pay_x, found_x = bitops.lookup_pair_batched(*args, packed=True)
    assert (np.asarray(found_p) == np.asarray(found_x)).all()
    assert (np.asarray(pay_p)[np.asarray(found_p)]
            == np.asarray(pay_x)[np.asarray(found_x)]).all()

    # lexsort + invert roundtrip under the kernel
    monkeypatch.setenv("SCENESPLAT_PALLAS_SORT", "1")
    lo = rng.integers(0, 2**24, (b, n)).astype(np.uint32)
    hi = np.zeros_like(lo)
    hi[:, -30:] = np.uint32(0x7FFFFFFF)  # masked slots
    shi, slo, order = bitops.lexsort_pair(
        jnp.asarray(hi), jnp.asarray(lo), packed=True
    )
    inverse = bitops.invert_order(order)
    order_np = np.asarray(order)
    assert (np.sort(order_np, axis=-1)
            == np.arange(n, dtype=np.int32)).all(), "order is a permutation"
    assert (np.take_along_axis(order_np, np.asarray(inverse), -1)
            == np.arange(n)).all()
    real = np.asarray(shi) != np.uint32(0x7FFFFFFF)
    s = np.asarray(slo)
    assert ((np.diff(s, axis=-1) >= 0) | ~real[:, 1:]).all()


def test_sort_rows_key_promotion_matches_lax(rng):
    """sort_rows promotes 1-key multi-payload sorts to 2 keys (the 1-key
    lowering compiles pathologically on TPU); results must stay a valid
    unstable sort of the same keys."""
    from scenesplat_tpu.ops.pallas_sort import sort_rows

    n = 3000
    k = rng.integers(0, 2**10, (2, n)).astype(np.uint32)  # heavy ties
    q = rng.integers(0, 50, (2, n)).astype(np.int32)
    p = np.tile(np.arange(n, dtype=np.int32), (2, 1))
    sk, sq, sp = sort_rows((jnp.asarray(k), jnp.asarray(q), jnp.asarray(p)),
                           num_keys=1)
    sk, sq, sp = np.asarray(sk), np.asarray(sq), np.asarray(sp)
    assert (sk == np.sort(k, axis=-1)).all()
    assert (np.sort(sp, axis=-1) == p).all()  # payload stays a permutation
    assert (np.take_along_axis(q, sp, -1) == sq).all()  # rows move together
