"""Stratified Transformer: window member tables, KPConv, forward."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.models.stratified import window_members


def test_window_members_basic_and_subset():
    # two windows along x: [0, 1) and [1, 2)
    coord = np.array([[
        [0.1, 0.1, 0.1], [0.5, 0.2, 0.3], [0.9, 0.9, 0.9],
        [1.2, 0.1, 0.1], [1.8, 0.5, 0.5],
    ]], np.float32)
    mask = np.ones((1, 5), bool)
    start = jnp.zeros((1, 1, 3), jnp.float32)
    midx, mval, wc = window_members(
        jnp.asarray(coord), jnp.asarray(mask), 1.0, start, capacity=4)
    midx, mval = np.asarray(midx), np.asarray(mval)
    # points 0,1,2 share a window; 3,4 share another
    assert set(midx[0, 0][mval[0, 0]]) == {0, 1, 2}
    assert set(midx[0, 1][mval[0, 1]]) == {0, 1, 2}
    assert set(midx[0, 3][mval[0, 3]]) == {3, 4}

    # subset restriction: only points 1 and 4 can be members
    subset = jnp.asarray([[False, True, False, False, True]])
    midx, mval, _ = window_members(
        jnp.asarray(coord), jnp.asarray(mask), 1.0, start, capacity=4,
        subset=subset)
    midx, mval = np.asarray(midx), np.asarray(mval)
    assert set(midx[0, 0][mval[0, 0]]) == {1}
    assert set(midx[0, 4][mval[0, 4]]) == {4}


def test_stratified_forward():
    model = build_model(dict(
        type="ST-v1m2", in_channels=6, num_classes=5,
        channels=(8, 8, 16, 16, 16),
        num_heads=(2, 2, 4, 4),
        depths=(2, 2, 1, 1),
        window_size=(0.4, 0.8, 1.6, 3.2),
        quant_size=(0.05, 0.1, 0.2, 0.4),
        down_ratio=0.5,
        down_num_sample=8,
        kp_ball_radius=0.3,
        kp_max_neighbor=8,
        kp_sigma_radius=0.1,
        fine_capacity=16,
        coarse_capacity=8,
        knn_tile=64,
    ))
    rng = np.random.default_rng(0)
    b, n = 2, 96
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 70:] = False
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )
    variables = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(variables, point)
    assert out.feat.shape == (2, 96, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())
    # RPE tables present
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = [jax.tree_util.keystr(k) for k, _ in flat]
    assert any("relative_pos_query_table" in s for s in names)
    assert any("relative_pos_value_table" in s for s in names)
