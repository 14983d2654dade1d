"""MinkUNet variants: registration, forward shapes, bottleneck path."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import MODELS, PointBatch, build_model


def _batch(rng, b=2, n=128, n_valid=(128, 90)):
    coord = rng.uniform(0, 2, size=(b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i, v in enumerate(n_valid):
        mask[i, :v] = True
    return PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )


def test_variant_registration_defaults():
    assert "MinkUNet34C" in MODELS
    m = MODELS.get("MinkUNet34C")(in_channels=6, out_channels=5)
    assert m.layers == (2, 3, 4, 6, 2, 2, 2, 2)
    assert m.planes == (32, 64, 128, 256, 256, 128, 96, 96)
    m50 = MODELS.get("MinkUNet50")(in_channels=6, out_channels=5)
    assert m50.block == "bottleneck"
    m14b = MODELS.get("MinkUNet14B")(in_channels=6, out_channels=5)
    assert m14b.planes == (32, 64, 128, 256, 128, 128, 128, 128)
    assert m14b.layers == (1,) * 8


def test_mink_unet_forward_basic():
    model = build_model(dict(
        type="MinkUNet14A", in_channels=6, out_channels=5,
        planes=(4, 8, 8, 8, 8, 8, 4, 4), init_dim=4,
        serialization_depth=10,
        stage_capacity=(1.0, 1.0, 0.9, 0.9),
    ))
    point = _batch(np.random.default_rng(0))
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 128, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())


def test_mink_unet_bottleneck_forward():
    model = build_model(dict(
        type="MinkUNet50", in_channels=6, out_channels=3,
        layers=(1,) * 8, planes=(2, 2, 2, 2, 4, 4, 4, 4), init_dim=4,
        serialization_depth=10,
        stage_capacity=(1.0, 1.0, 0.9, 0.9),
    ))
    point = _batch(np.random.default_rng(1), n_valid=(128, 128))
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 128, 3)
    assert bool(jnp.isfinite(out.feat).all())
