"""PTv2 backbone: shapes, padding invariance, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import MODELS, PointBatch, build_model


def _tiny_cfg(num_classes=5, **kw):
    cfg = dict(
        type="PT-v2m2",
        in_channels=6,
        num_classes=num_classes,
        patch_embed_depth=1,
        patch_embed_channels=8,
        patch_embed_groups=2,
        patch_embed_neighbours=4,
        enc_depths=(1, 1),
        enc_channels=(16, 24),
        enc_groups=(2, 4),
        enc_neighbours=(4, 4),
        dec_depths=(1, 1),
        dec_channels=(8, 16),
        dec_groups=(2, 4),
        dec_neighbours=(4, 4),
        grid_sizes=(0.2, 0.4),
        stage_capacity=(1.0, 0.9),
        knn_tile=64,
    )
    cfg.update(kw)
    return cfg


def _batch(rng, b=2, n=96, n_valid=(96, 60)):
    coord = rng.uniform(0, 2, size=(b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i, v in enumerate(n_valid):
        mask[i, :v] = True
    coord[~mask] = 55.0
    feat[~mask] = 9.0
    return PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )


def test_ptv2_forward_shapes():
    model = build_model(_tiny_cfg())
    point = _batch(np.random.default_rng(0))
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 96, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())


def test_ptv2_padding_invariance():
    """Valid-point outputs must not depend on padding content or amount."""
    model = build_model(_tiny_cfg(num_classes=0))
    rng = np.random.default_rng(1)
    b, n, nv = 1, 80, 50
    coord = rng.uniform(0, 2, size=(b, nv, 3)).astype(np.float32)
    feat = rng.normal(size=(b, nv, 6)).astype(np.float32)

    def run(pad_to, fill):
        c = np.full((b, pad_to, 3), fill, np.float32)
        f = np.full((b, pad_to, 6), fill, np.float32)
        m = np.zeros((b, pad_to), bool)
        c[:, :nv], f[:, :nv], m[:, :nv] = coord, feat, True
        point = PointBatch.from_inputs(
            jnp.asarray(c), jnp.asarray(f), mask=jnp.asarray(m), grid_size=0.05
        )
        params = model.init(jax.random.PRNGKey(7), point)
        return np.asarray(model.apply(params, point).feat)[:, :nv], params

    out1, _ = run(n, 33.0)
    out2, _ = run(n, -11.0)
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-5)


def test_ptv2_m1_grouped_linear_and_grads():
    model = build_model(_tiny_cfg(type="PT-v2m1", num_classes=4))
    point = _batch(np.random.default_rng(2), n_valid=(96, 96))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        point, train=True,
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            point, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(out.feat**2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    norms = [float(jnp.abs(g).max()) for g in leaves]
    assert sum(x > 0 for x in norms) > len(norms) * 0.7


def test_ptv2_m3_pdnorm_condition_selects():
    import jax.numpy as jnp

    model = build_model(_tiny_cfg(
        type="PT-v2m3", num_classes=4,
        conditions=("A", "B", "C"), context_channels=8, pd_adaptive=True,
    ))
    point = _batch(np.random.default_rng(5))
    cond0 = jnp.asarray(0, jnp.int32)
    # per-condition contexts, as PPT's embedding table supplies
    ctx0 = jnp.ones((2, 8), jnp.float32)
    ctx2 = jnp.full((2, 8), -0.5, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), point, condition_index=cond0,
                           context=ctx0)
    out0 = model.apply(variables, point, condition_index=cond0, context=ctx0)
    out1 = model.apply(variables, point,
                       condition_index=jnp.asarray(2, jnp.int32), context=ctx2)
    assert out0.feat.shape == (2, 96, 4)
    assert bool(jnp.isfinite(out0.feat[out0.mask]).all())
    # freshly-initialized per-condition norms are identical; the adaptive
    # context modulation is what differentiates conditions here
    assert not np.allclose(np.asarray(out0.feat), np.asarray(out1.feat))
