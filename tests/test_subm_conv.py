"""Submanifold conv neighbor lookup and apply vs numpy brute force."""

import numpy as np
import jax.numpy as jnp

from scenesplat_tpu.ops import subm_conv


def make_scene(rng, b=2, n=200, extent=12):
    # unique voxels per scene (submanifold semantics assume dedup'd voxels)
    gcs, masks = [], []
    for bi in range(b):
        nv = n - 17 * bi
        all_cells = rng.permutation(extent**3)[:nv]
        gc = np.stack(np.unravel_index(all_cells, (extent,) * 3), -1)
        gc = np.concatenate([gc, np.zeros((n - nv, 3), np.int64)]).astype(np.int32)
        mask = np.arange(n) < nv
        gcs.append(gc)
        masks.append(mask)
    return np.stack(gcs), np.stack(masks)


def make_big_extent_scene(rng, b=2, n=200, extent=1000):
    """Unique voxels at extents where make_scene's full permutation is
    infeasible: rejection-sample distinct flat cells."""
    gcs, masks = [], []
    for bi in range(b):
        nv = n - 17 * bi
        cells = np.unique(rng.integers(0, extent**3, 4 * n))[:nv]
        assert len(cells) == nv
        gc = np.stack(np.unravel_index(cells, (extent,) * 3), -1)
        gc = np.concatenate([gc, np.zeros((n - nv, 3), np.int64)]).astype(
            np.int32
        )
        masks.append(np.arange(n) < nv)
        gcs.append(gc)
    return np.stack(gcs), np.stack(masks)


def brute_force_plan(gc, mask, kernel_size):
    b, n, _ = gc.shape
    offsets = subm_conv.kernel_offsets(kernel_size)
    idx = np.zeros((b, len(offsets), n), np.int32)
    valid = np.zeros((b, len(offsets), n), bool)
    for bi in range(b):
        table = {tuple(gc[bi, i]): i for i in range(n) if mask[bi, i]}
        for ki, off in enumerate(offsets):
            for i in range(n):
                if not mask[bi, i]:
                    continue
                q = tuple(gc[bi, i] + np.array(off))
                if min(q) < 0:
                    continue
                j = table.get(q)
                if j is not None:
                    idx[bi, ki, i] = j
                    valid[bi, ki, i] = True
    return idx, valid


def test_plan_matches_bruteforce(rng):
    gc, mask = make_scene(rng)
    plan = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=16
    )
    exp_idx, exp_valid = brute_force_plan(gc, mask, 3)
    got_valid = np.asarray(plan.neighbor_valid)
    got_idx = np.asarray(plan.neighbor_index)
    np.testing.assert_array_equal(got_valid, exp_valid)
    np.testing.assert_array_equal(got_idx[exp_valid], exp_idx[exp_valid])


def test_conv_apply(rng):
    gc, mask = make_scene(rng, b=1, n=100, extent=8)
    cin, cout = 6, 8
    feat = rng.normal(size=(1, 100, cin)).astype(np.float32)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
    bias = rng.normal(size=(cout,)).astype(np.float32)

    plan = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=16
    )
    got = np.asarray(
        subm_conv.subm_conv_apply(jnp.asarray(feat), plan, jnp.asarray(w), jnp.asarray(bias))
    )

    exp_idx, exp_valid = brute_force_plan(gc, mask, 3)
    expected = np.broadcast_to(bias, (1, 100, cout)).copy()
    for ki in range(27):
        for i in range(100):
            if exp_valid[0, ki, i]:
                expected[0, i] += feat[0, exp_idx[0, ki, i]] @ w[ki]
    valid = mask[0]
    np.testing.assert_allclose(got[0, valid], expected[0, valid], rtol=1e-4, atol=1e-4)


def test_center_offset_is_identity(rng):
    gc, mask = make_scene(rng, b=1, n=64, extent=6)
    plan = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=16
    )
    center = len(subm_conv.kernel_offsets(3)) // 2
    idx = np.asarray(plan.neighbor_index[0, center])
    valid = np.asarray(plan.neighbor_valid[0, center])
    m = mask[0]
    assert valid[m].all()
    np.testing.assert_array_equal(idx[m], np.nonzero(m)[0])


def test_plan_packed_depth10_flagship_extent(rng):
    """Regression: coords >= 256 carry code bits [24, 30) in the hi lane;
    the packed join must repack (hi << 24) | lo, not assume hi == 0. The
    flagship operates at depth 10 with 6x6 m / 2 cm chunks -> coords up to
    ~320, so this is the production regime (the original packed path
    silently dropped every such point as data)."""
    gc, mask = make_big_extent_scene(rng, b=2, n=150, extent=320)
    import jax.numpy as jnp

    plan16 = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=16
    )
    plan10 = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=10
    )
    np.testing.assert_array_equal(
        np.asarray(plan10.neighbor_valid), np.asarray(plan16.neighbor_valid)
    )
    v = np.asarray(plan10.neighbor_valid)
    np.testing.assert_array_equal(
        np.asarray(plan10.neighbor_index)[v], np.asarray(plan16.neighbor_index)[v]
    )


def test_lexsort_packed_matches_pair_flagship_extent(rng):
    """Regression for the same lane-split bug in serialization sorts."""
    import jax.numpy as jnp

    from scenesplat_tpu.ops.bitops import lexsort_pair
    from scenesplat_tpu.ops.curves import z_order_encode

    gc, mask = make_big_extent_scene(rng, b=2, n=200, extent=1000)
    hi, lo = z_order_encode(jnp.asarray(gc), depth=10)
    hi = jnp.where(jnp.asarray(mask), hi, jnp.uint32(0x7FFFFFFF))
    shi_p, slo_p, order_p = lexsort_pair(hi, lo, packed=True)
    shi_r, slo_r, order_r = lexsort_pair(hi, lo, packed=False)
    # padding slots tie on the sentinel and may permute arbitrarily between
    # the two (unstable) sorts — compare the valid prefix per row
    for bi in range(mask.shape[0]):
        nv = int(mask[bi].sum())
        np.testing.assert_array_equal(
            np.asarray(order_p)[bi, :nv], np.asarray(order_r)[bi, :nv]
        )
        np.testing.assert_array_equal(
            np.asarray(shi_p)[bi, :nv], np.asarray(shi_r)[bi, :nv]
        )
        np.testing.assert_array_equal(
            np.asarray(slo_p)[bi, :nv], np.asarray(slo_r)[bi, :nv]
        )


def test_plan_packed_depth10(rng):
    """Packed (depth<=10) lookup path must match the generic pair path."""
    gc, mask = make_scene(rng, b=2, n=150, extent=12)
    import jax.numpy as jnp

    plan16 = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=16
    )
    plan10 = subm_conv.build_subm_conv_plan(
        jnp.asarray(gc), jnp.asarray(mask), kernel_size=3, depth=10
    )
    np.testing.assert_array_equal(
        np.asarray(plan10.neighbor_valid), np.asarray(plan16.neighbor_valid)
    )
    v = np.asarray(plan10.neighbor_valid)
    np.testing.assert_array_equal(
        np.asarray(plan10.neighbor_index)[v], np.asarray(plan16.neighbor_index)[v]
    )


def test_dense_plan_matches_bruteforce(rng):
    gc, mask = make_scene(rng)
    for k in (3, 5):
        plan = subm_conv.build_subm_conv_plan_dense(
            jnp.asarray(gc), jnp.asarray(mask), kernel_size=k,
            extent=(16, 16, 16),
        )
        exp_idx, exp_valid = brute_force_plan(gc, mask, k)
        np.testing.assert_array_equal(np.asarray(plan.neighbor_valid), exp_valid)
        np.testing.assert_array_equal(
            np.asarray(plan.neighbor_index)[exp_valid], exp_idx[exp_valid]
        )


def test_dense_plan_matches_join(rng):
    """Dense-grid and merge-join builders agree on unique-voxel scenes."""
    gc, mask = make_scene(rng, b=2, n=300, extent=14)
    for k in (3, 5):
        dense = subm_conv.build_subm_conv_plan_dense(
            jnp.asarray(gc), jnp.asarray(mask), kernel_size=k,
            extent=(14, 14, 14),
        )
        join = subm_conv.build_subm_conv_plan(
            jnp.asarray(gc), jnp.asarray(mask), kernel_size=k, depth=10
        )
        np.testing.assert_array_equal(
            np.asarray(dense.neighbor_valid), np.asarray(join.neighbor_valid)
        )
        v = np.asarray(dense.neighbor_valid)
        np.testing.assert_array_equal(
            np.asarray(dense.neighbor_index)[v],
            np.asarray(join.neighbor_index)[v],
        )
