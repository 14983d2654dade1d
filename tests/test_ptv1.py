"""PTv1 seg/cls: registration, forward shapes, finiteness."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import MODELS, PointBatch, build_model


def _batch(rng, b=2, n=256, n_valid=(256, 180), c=6):
    coord = rng.uniform(0, 2, size=(b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i, v in enumerate(n_valid):
        mask[i, :v] = True
    return PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )


def test_registration():
    for name in ["PointTransformer-Seg26", "PointTransformer-Seg38",
                 "PointTransformer-Seg50", "PointTransformer-Cls26",
                 "PointTransformer-Cls38", "PointTransformer-Cls50"]:
        assert name in MODELS
    assert MODELS.get("PointTransformer-Seg50")(in_channels=6).blocks == (1, 2, 3, 5, 2)


def test_ptv1_seg_forward():
    model = build_model(dict(
        type="PointTransformer-Seg26", in_channels=6, num_classes=7,
        knn_tile=64,
    ))
    point = _batch(np.random.default_rng(0))
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 256, 7)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())


def test_ptv1_cls_forward():
    model = build_model(dict(
        type="PointTransformer-Cls38", in_channels=6, num_classes=9,
        knn_tile=64,
    ))
    point = _batch(np.random.default_rng(1), c=3)
    params = model.init(jax.random.PRNGKey(0), point)
    logits = model.apply(params, point)
    assert logits.shape == (2, 9)
    assert bool(jnp.isfinite(logits).all())
