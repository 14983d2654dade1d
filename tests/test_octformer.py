"""OctFormer: forward, dilation grouping, RPE."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model


def test_octformer_forward():
    model = build_model(dict(
        type="OctFormer-v1m1", in_channels=6, num_classes=5,
        fpn_channels=8,
        channels=(8, 8, 16),
        num_blocks=(2, 1, 1),  # block 1 of stage 0 uses dilation
        num_heads=(2, 2, 4),
        patch_size=8,
        stem_down=2,
        head_up=2,
        dilation=2,
        drop_path=0.1,
        octree_scale_factor=2.56,
        octree_depth=8,
        serialization_depth=10,
        stage_capacity=(1.0, 1.0, 0.9, 0.9),
    ))
    rng = np.random.default_rng(0)
    b, n = 2, 128
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 100:] = False
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )
    variables = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(variables, point)
    assert out.feat.shape == (2, 128, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())
    # rpe tables exist for the attention blocks
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("rpe_table" in jax.tree_util.keystr(k) for k, _ in flat)

    def loss_fn(p):
        o, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            point, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(o.feat[o.mask] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(grads))
