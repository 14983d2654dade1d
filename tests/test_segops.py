"""Pooling / segment-reduce correctness vs a numpy brute-force model."""

import numpy as np
import jax.numpy as jnp

from scenesplat_tpu.ops import segops
from scenesplat_tpu.ops.serialization import serialize


def make_batch(rng, b=2, n=256, extent=32):
    gc = rng.integers(0, extent, size=(b, n, 3)).astype(np.int32)
    n_valid = np.array([n - 37 * bi for bi in range(b)])
    mask = np.arange(n)[None, :] < n_valid[:, None]
    gc[~mask] = 0
    return gc, mask, n_valid


def test_segment_reduce_matches_numpy(rng):
    b, n, s, c = 2, 64, 10, 5
    vals = rng.normal(size=(b, n, c)).astype(np.float32)
    ids = rng.integers(0, s, size=(b, n)).astype(np.int32)
    counts = np.zeros((b, s), np.int32)
    for bi in range(b):
        for si in range(s):
            counts[bi, si] = (ids[bi] == si).sum()
    for reduce in ["sum", "mean", "max"]:
        got = np.asarray(
            segops.segment_reduce(
                jnp.asarray(vals), jnp.asarray(ids), s, jnp.asarray(counts), reduce
            )
        )
        for bi in range(b):
            for si in range(s):
                sel = vals[bi][ids[bi] == si]
                if sel.size == 0:
                    expected = np.zeros(c, np.float32)
                elif reduce == "sum":
                    expected = sel.sum(0)
                elif reduce == "mean":
                    expected = sel.mean(0)
                else:
                    expected = sel.max(0)
                np.testing.assert_allclose(got[bi, si], expected, rtol=1e-5, atol=1e-5)


def test_pooling_plan_clusters(rng):
    gc, mask, n_valid = make_batch(rng)
    b, n = mask.shape
    ser = serialize(jnp.asarray(gc), jnp.asarray(mask), orders=("z", "hilbert"), depth=16)
    plan = segops.build_pooling_plan(ser, jnp.asarray(mask), out_capacity=n)

    for bi in range(b):
        valid_gc = gc[bi][mask[bi]]
        parents = valid_gc >> 1
        expected_clusters = len(np.unique(parents, axis=0))
        assert int(plan.n_clusters[bi]) == expected_clusters
        assert int(plan.n_overflow[bi]) == 0
        assert int(plan.out_mask[bi].sum()) == expected_clusters

        # every valid point maps to the cluster holding its parent voxel
        cluster = np.asarray(plan.cluster_of_point[bi])
        head = np.asarray(plan.head_index[bi])
        for i in np.nonzero(mask[bi])[0][:50]:
            c = cluster[i]
            head_parent = gc[bi, head[c]] >> 1
            np.testing.assert_array_equal(gc[bi, i] >> 1, head_parent)


def test_pool_values_mean(rng):
    gc, mask, _ = make_batch(rng, b=1, n=128, extent=8)
    vals = rng.normal(size=(1, 128, 4)).astype(np.float32)
    vals[~mask] = 1e6  # padding must not leak into pooled means
    ser = serialize(jnp.asarray(gc), jnp.asarray(mask), orders=("z",), depth=16)
    plan = segops.build_pooling_plan(ser, jnp.asarray(mask), out_capacity=128)
    pooled = np.asarray(segops.pool_values(plan, jnp.asarray(vals), "mean"))

    parents = gc[0] >> 1
    valid = mask[0]
    cluster = np.asarray(plan.cluster_of_point[0])
    for c in range(int(plan.n_clusters[0])):
        members = np.nonzero(valid & (cluster == c))[0]
        np.testing.assert_allclose(
            pooled[0, c], vals[0, members].mean(0), rtol=1e-5, atol=1e-5
        )


def test_pool_serialization_and_unpool(rng):
    gc, mask, _ = make_batch(rng, b=2, n=256, extent=16)
    ser = serialize(jnp.asarray(gc), jnp.asarray(mask), orders=("z", "hilbert"), depth=16)
    plan = segops.build_pooling_plan(ser, jnp.asarray(mask), out_capacity=128)
    pser = segops.pool_serialization(plan, ser)

    # pooled orders put all valid clusters before padding
    for s in range(2):
        for bi in range(2):
            nvalid = int(plan.out_mask[bi].sum())
            sorted_idx = np.asarray(pser.order[s, bi][:nvalid])
            assert (sorted_idx < 128).all()
            hi = np.asarray(pser.code_hi[s, bi])
            lo = np.asarray(pser.code_lo[s, bi])
            key = hi[sorted_idx].astype(np.uint64) << np.uint64(24)
            key = key + lo[sorted_idx]
            assert (np.diff(key.astype(np.int64)) >= 0).all()
            # inverse is the true inverse permutation of order
            order_s = np.asarray(pser.order[s, bi])
            inverse_s = np.asarray(pser.inverse[s, bi])
            np.testing.assert_array_equal(
                order_s[inverse_s], np.arange(order_s.size)
            )

    # unpool broadcasts cluster values back to members
    cvals = rng.normal(size=(2, 128, 3)).astype(np.float32)
    up = np.asarray(segops.unpool_values(jnp.asarray(cvals), plan.cluster_of_point))
    cluster = np.asarray(plan.cluster_of_point)
    for bi in range(2):
        for i in np.nonzero(mask[bi])[0][:20]:
            np.testing.assert_array_equal(up[bi, i], cvals[bi, cluster[bi, i]])


def test_pooling_overflow_capacity(rng):
    # capacity smaller than cluster count: overflow counted, output mask capped
    gc, mask, _ = make_batch(rng, b=1, n=256, extent=64)
    ser = serialize(jnp.asarray(gc), jnp.asarray(mask), orders=("z",), depth=16)
    plan = segops.build_pooling_plan(ser, jnp.asarray(mask), out_capacity=16)
    assert int(plan.n_overflow[0]) == int(plan.n_clusters[0]) - 16
    assert int(plan.out_mask[0].sum()) == 16


def test_pool_serialization_packed(rng):
    gc, mask, _ = make_batch(rng, b=2, n=256, extent=16)
    import jax.numpy as jnp

    ser10 = serialize(jnp.asarray(gc), jnp.asarray(mask), orders=("z", "hilbert"), depth=10)
    plan = segops.build_pooling_plan(ser10, jnp.asarray(mask), out_capacity=128)
    pser = segops.pool_serialization(plan, ser10, packed=True)
    for s in range(2):
        for bi in range(2):
            nvalid = int(plan.out_mask[bi].sum())
            idx = np.asarray(pser.order[s, bi][:nvalid])
            lo = np.asarray(pser.code_lo[s, bi])
            assert (np.diff(lo[idx].astype(np.int64)) >= 0).all()
