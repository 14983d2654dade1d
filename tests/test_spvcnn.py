"""SPVCNN: point<->voxel transfer correctness + forward."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.models.spvcnn import point_to_voxel, voxel_to_point
from scenesplat_tpu.models.spunet import LevelState
from scenesplat_tpu.ops.serialization import serialize
from scenesplat_tpu.ops.subm_conv import build_subm_conv_plan


def test_voxel_to_point_stride1_identity():
    rng = np.random.default_rng(0)
    b, n = 1, 32
    gc = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1)
    gc = gc.reshape(-1, 3)[:n][None].astype(np.int32)
    mask = np.ones((b, n), bool)
    ser = serialize(jnp.asarray(gc), jnp.asarray(mask), orders=("z",), depth=10)
    level = LevelState(
        grid_coord=jnp.asarray(gc), mask=jnp.asarray(mask), ser=ser,
        conv_plan=build_subm_conv_plan(
            jnp.asarray(gc), jnp.asarray(mask), 3, depth=10,
            z_sorted=(ser.code_hi[0], ser.code_lo[0], ser.order[0]),
        ),
    )
    feat = jnp.asarray(rng.normal(size=(b, n, 5)).astype(np.float32))
    out = voxel_to_point(feat, level, jnp.asarray(gc), jnp.asarray(mask),
                         stride_log2=0, depth=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), rtol=1e-5,
                               atol=1e-6)


def test_point_to_voxel_mean():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.normal(size=(1, 6, 2)).astype(np.float32))
    p2l = jnp.asarray([[0, 0, 1, 1, 1, 2]], jnp.int32)
    mask = jnp.asarray([[True, True, True, True, False, True]])
    out = np.asarray(point_to_voxel(feat, p2l, mask, 3))
    f = np.asarray(feat)[0]
    np.testing.assert_allclose(out[0, 0], (f[0] + f[1]) / 2, rtol=1e-5)
    np.testing.assert_allclose(out[0, 1], (f[2] + f[3]) / 2, rtol=1e-5)
    np.testing.assert_allclose(out[0, 2], f[5], rtol=1e-5)


def test_spvcnn_forward():
    model = build_model(dict(
        type="SPVCNN", in_channels=6, out_channels=5,
        base_channels=4, channels=(4, 8, 8, 8, 8, 8, 4, 4),
        layers=(1,) * 8,
        serialization_depth=10,
        stage_capacity=(1.0, 1.0, 0.9, 0.9),
    ))
    rng = np.random.default_rng(2)
    b, n = 2, 128
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 100:] = False
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 128, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())
