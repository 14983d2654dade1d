"""OA-CNNs: forward shapes, finiteness, masked softmax sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model


def test_oacnns_forward():
    model = build_model(dict(
        type="OACNNs", in_channels=6, num_classes=5,
        embed_channels=8,
        enc_channels=(8, 16),
        groups=(2, 4),
        enc_depth=(1, 1),
        dec_channels=(8, 16),
        point_grid_size=((4, 8), (2, 4)),
        dec_depth=(1, 1),
        serialization_depth=10,
        stage_capacity=(1.0, 1.0),
    ))
    rng = np.random.default_rng(0)
    b, n = 2, 128
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 90:] = False
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 128, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())

    def loss_fn(p):
        o, _ = model.apply(p, point, train=True, mutable=["batch_stats"])
        return jnp.sum(o.feat[o.mask] ** 2)

    grads = jax.grad(lambda p: loss_fn({"params": p,
                                        "batch_stats": params["batch_stats"]}))(
        params["params"])
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(grads))
