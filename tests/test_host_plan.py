"""Host-built stem conv plans (native subm_dense_plan + HostConvPlan
transform) vs the device dense builder, and their collate/geometry wiring.

The host build must match ops/subm_conv.py:build_subm_conv_plan_dense
exactly (valid masks equal everywhere; neighbor indices equal where valid) —
a permuted or offset host plan would silently scramble the stem conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenesplat_tpu import native
from scenesplat_tpu.ops.subm_conv import build_subm_conv_plan_dense


def _rand_scene(rng, n, extent, oob_frac=0.0, masked_tail=0):
    gc = rng.integers(0, extent[0], (n, 3)).astype(np.int32)
    # one point per voxel (GridSample contract): dedup then pad by masking
    _, uniq = np.unique(
        (gc[:, 0].astype(np.int64) * extent[1] + gc[:, 1]) * extent[2]
        + gc[:, 2],
        return_index=True,
    )
    keep = np.zeros(n, bool)
    keep[uniq] = True
    gc = gc[keep]
    n_u = gc.shape[0]
    if oob_frac > 0:
        k = max(1, int(n_u * oob_frac))
        idx = rng.choice(n_u, k, replace=False)
        gc[idx[: k // 2], 0] = extent[0] + rng.integers(0, 5, k // 2)
        gc[idx[k // 2:], 2] = -1 - rng.integers(0, 3, k - k // 2)
    mask = np.ones(n_u, bool)
    if masked_tail:
        mask[-masked_tail:] = False
    return gc, mask


def _device_plan(gc, mask, k, extent):
    plan = jax.jit(
        lambda g, m: build_subm_conv_plan_dense(
            g, m, kernel_size=k, extent=extent
        )
    )(jnp.asarray(gc[None]), jnp.asarray(mask[None]))
    return (
        np.asarray(plan.neighbor_index[0]),  # [K3, n]
        np.asarray(plan.neighbor_valid[0]),
    )


@pytest.mark.parametrize("k", [3, 5])
def test_host_plan_matches_device(rng, k):
    extent = (24, 20, 28)
    gc, mask = _rand_scene(rng, 3000, extent, oob_frac=0.05, masked_tail=37)
    nbr_h, val_h = native.subm_dense_plan(gc, mask, k, extent)  # [n, K3]
    nbr_d, val_d = _device_plan(gc, mask, k, extent)  # [K3, n]
    np.testing.assert_array_equal(val_h.T, val_d)
    np.testing.assert_array_equal(
        np.where(val_h.T, nbr_h.T, 0), np.where(val_d, nbr_d, 0)
    )
    # sanity: plans are non-trivial (points do have occupied neighbors)
    assert val_h.sum() > gc.shape[0]  # at least the self-offset per point


def test_numpy_fallback_matches_native(rng, monkeypatch):
    if not native.available():
        pytest.skip("native lib unavailable; fallback IS the implementation")
    extent = (16, 16, 16)
    gc, mask = _rand_scene(rng, 1500, extent, oob_frac=0.1, masked_tail=11)
    nbr_c, val_c = native.subm_dense_plan(gc, mask, 3, extent)
    monkeypatch.setattr(native, "_LIB", False)
    nbr_np, val_np = native.subm_dense_plan(gc, mask, 3, extent)
    np.testing.assert_array_equal(val_c, val_np)
    np.testing.assert_array_equal(nbr_c, nbr_np)


def test_geometry_with_host_stem_plan_identical(rng):
    """Forward through PTv3 with a host-built stem plan == device-built."""
    from scenesplat_tpu.models.ptv3 import (
        PointTransformerV3, stem_plan_from_batch,
    )
    from scenesplat_tpu.models.structure import PointBatch

    extent = (32, 32, 32)
    gc, mask = _rand_scene(rng, 900, extent)
    n = (gc.shape[0] + 15) // 16 * 16  # patch_size-aligned, masked tail
    pad = n - gc.shape[0]
    mask = np.concatenate([mask, np.zeros(pad, bool)])
    gc = np.concatenate([gc, np.zeros((pad, 3), np.int32)])
    coord = gc.astype(np.float32) * 0.02 + 0.01
    feat = rng.normal(size=(n, 6)).astype(np.float32)
    point = PointBatch(
        coord=jnp.asarray(coord[None]),
        feat=jnp.asarray(feat[None]),
        grid_coord=jnp.asarray(gc[None]),
        mask=jnp.asarray(mask[None]),
    )
    bb = PointTransformerV3(
        in_channels=6,
        order=("z", "z-trans"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 32),
        enc_num_head=(1, 2, 4),
        enc_patch_size=(16, 16, 16),
        dec_depths=(1, 1),
        dec_channels=(8, 16),
        dec_num_head=(1, 2),
        dec_patch_size=(16, 16),
        serialization_depth=6,
        dense_extent=extent,
    )
    nbr, valid = native.subm_dense_plan(gc, mask, 5, extent)
    batch = {"stem_nbr": nbr[None], "stem_valid": valid[None]}
    host_plan = stem_plan_from_batch(batch)
    g_dev = jax.jit(bb.build_geometry)(point)
    g_host = jax.jit(
        lambda p, sp: bb.build_geometry(p, stem_plan=sp)
    )(point, host_plan)
    variables = bb.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        point, geometry=g_dev,
    )
    out_dev = bb.apply(variables, point, geometry=g_dev)
    out_host = bb.apply(variables, point, geometry=g_host)
    np.testing.assert_allclose(
        np.asarray(out_dev.feat), np.asarray(out_host.feat), rtol=0, atol=0
    )
    # staged builder takes the same host plan
    g_staged = bb.build_geometry_staged(point, stem_plan=host_plan)
    out_staged = bb.apply(variables, point, geometry=g_staged)
    np.testing.assert_allclose(
        np.asarray(out_dev.feat), np.asarray(out_staged.feat), rtol=0, atol=0
    )


def test_collate_plan_keys(rng):
    """HostConvPlan keys survive padding, die on mix/downsample."""
    from scenesplat_tpu.data.collate import collate_padded
    from scenesplat_tpu.data.transforms import HostConvPlan, seed_transforms

    seed_transforms((0, 0, 0, 0))
    t = HostConvPlan(kernel_size=5, extent=(16, 16, 16))
    samples = []
    for i in range(2):
        gc, _ = _rand_scene(rng, 700, (16, 16, 16))
        n = gc.shape[0]
        samples.append(t({
            "coord": gc.astype(np.float32) * 0.02,
            "feat": rng.normal(size=(n, 3)).astype(np.float32),
            "grid_coord": gc,
        }))
    n_max = max(s["coord"].shape[0] for s in samples)
    num_points = n_max + 16
    batch = collate_padded(samples, num_points)
    assert batch["stem_nbr"].shape == (2, num_points, 125)
    assert batch["stem_valid"].shape == (2, num_points, 125)
    # padded tail is inert: no valid neighbors, index 0
    for i, s in enumerate(samples):
        n = s["coord"].shape[0]
        assert not batch["stem_valid"][i, n:].any()
        assert (batch["stem_nbr"][i, n:] == 0).all()
        np.testing.assert_array_equal(batch["stem_nbr"][i, :n], s["stem_nbr"])
    # padded-batch plan == device plan on the padded batch (indices are
    # within-sample, padding only appends masked points)
    nbr_d, val_d = _device_plan(
        np.ascontiguousarray(batch["grid_coord"][0]),
        batch["mask"][0], 5, (16, 16, 16),
    )
    np.testing.assert_array_equal(batch["stem_valid"][0].T, val_d)
    np.testing.assert_array_equal(
        np.where(val_d, batch["stem_nbr"][0].T, 0), np.where(val_d, nbr_d, 0)
    )
    # over-budget downsample drops the keys (indices would go stale)
    small = collate_padded(samples, samples[0]["coord"].shape[0] // 2)
    assert "stem_nbr" not in small and "stem_valid" not in small
    # Mix3D merge drops the keys
    seed_transforms((0, 0, 0, 1))
    mixed = collate_padded(samples, num_points, mix_prob=1.0)
    assert "stem_nbr" not in mixed
