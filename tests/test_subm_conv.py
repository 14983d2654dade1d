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
