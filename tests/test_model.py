"""PTv3 backbone: shape, masking, determinism, and gradient-flow tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenesplat_tpu.models import MODELS, PointBatch, build_model
from scenesplat_tpu.models.losses.builder import build_criteria


def tiny_backbone_cfg(**overrides):
    cfg = dict(
        type="PT-v3m1",
        in_channels=5,
        order=("z", "hilbert"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 24),
        enc_num_head=(2, 2, 2),
        enc_patch_size=(16, 16, 16),
        dec_depths=(1, 1),
        dec_channels=(8, 16),
        dec_num_head=(2, 2),
        dec_patch_size=(16, 16),
        mlp_ratio=2,
        drop_path=0.1,
        use_pallas=False,
        shuffle_orders=True,
    )
    cfg.update(overrides)
    return cfg


def make_point_batch(rng, b=2, n=64, c=5, extent=16):
    coord = rng.uniform(0, extent * 0.02, size=(b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, c)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, n - 10 :] = False
    gc = np.floor(coord / 0.02).astype(np.int32)
    coord[~mask] = 0
    feat[~mask] = 0
    gc[~mask] = 0
    return PointBatch(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(feat),
        grid_coord=jnp.asarray(gc),
        mask=jnp.asarray(mask),
    )


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.default_rng(1)
    model = build_model(tiny_backbone_cfg())
    point = make_point_batch(rng)
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(point)
    fwd = jax.jit(lambda v, p: model.apply(v, p, train=False))
    return model, variables, point, fwd


def test_forward_shapes(model_and_params):
    model, variables, point, fwd = model_and_params
    out = fwd(variables, point)
    assert out.feat.shape == (2, 64, 8)  # dec_channels[0]
    assert out.mask.shape == (2, 64)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(point.mask))


def test_padding_invariance(model_and_params):
    """Changing values at padded slots must not change valid outputs."""
    model, variables, point, fwd = model_and_params
    out1 = fwd(variables, point)

    noise = np.zeros(point.feat.shape, np.float32)
    noise[1, 54:] = 7.7
    point2 = point.replace(
        feat=point.feat + jnp.asarray(noise),
        coord=point.coord + jnp.asarray(noise[..., :3] * 0.3),
    )
    out2 = fwd(variables, point2)
    m = np.asarray(point.mask)
    np.testing.assert_allclose(
        np.asarray(out1.feat)[m], np.asarray(out2.feat)[m], rtol=2e-4, atol=2e-5
    )


def test_eval_deterministic(model_and_params):
    model, variables, point, fwd = model_and_params
    a = fwd(variables, point)
    b = fwd(variables, point)
    np.testing.assert_array_equal(np.asarray(a.feat), np.asarray(b.feat))


def test_train_mode_runs_and_batch_stats_update(model_and_params):
    model, variables, point, fwd = model_and_params
    train_fn = jax.jit(
        lambda v, p: model.apply(
            v,
            p,
            train=True,
            rngs={
                "dropout": jax.random.PRNGKey(2),
                "shuffle": jax.random.PRNGKey(3),
            },
            mutable=["batch_stats"],
        )
    )
    out, updates = train_fn(variables, point)
    assert jnp.isfinite(out.feat).all()
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new)
    )


def test_gradients_flow(model_and_params):
    model, variables, point, fwd = model_and_params

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            point,
            train=False,
        )
        return jnp.sum((out.feat * out.mask[..., None]) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero_paths = [
        jax.tree_util.keystr(p)
        for p, g in flat
        if not np.any(np.abs(np.asarray(g)) > 0)
    ]
    # every parameter must receive gradient
    assert zero_paths == [], f"no gradient for: {zero_paths[:10]}"


def test_lang_pretrainer_and_losses(model_and_params):
    rng = np.random.default_rng(3)
    point = make_point_batch(rng)
    model = build_model(
        dict(type="LangPretrainer", backbone=tiny_backbone_cfg())
    )
    variables = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(point)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, point)
    norms = np.linalg.norm(np.asarray(out.feat), axis=-1)
    m = np.asarray(out.mask)
    np.testing.assert_allclose(norms[m], 1.0, rtol=1e-5)

    criteria = build_criteria(
        [
            dict(type="CosineSimilarity", reduction="mean", loss_weight=1.0),
            dict(type="L2Loss", reduction="mean", loss_weight=1.0),
            dict(
                type="AggregatedContrastiveLoss",
                temperature=0.2,
                loss_weight=0.02,
                schedule="last_75",
                num_classes=8,
                min_samples=5,
            ),
        ]
    )
    lang_feat = rng.normal(size=out.feat.shape).astype(np.float32)
    valid_feat_mask = rng.random(out.mask.shape) > 0.3
    segment = rng.integers(0, 8, size=out.mask.shape).astype(np.int32)
    loss = criteria(
        out.feat,
        jnp.asarray(lang_feat),
        valid_feat_mask=jnp.asarray(valid_feat_mask),
        mask=out.mask,
        segment=jnp.asarray(segment),
        epoch_progress=0.9,
        rng=jax.random.PRNGKey(5),
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_lovasz_loss_matches_reference_semantics(rng):
    """Fixed-shape Lovasz vs a direct dynamic-shape numpy implementation."""
    import jax.numpy as jnp
    from scenesplat_tpu.models.losses.lovasz import LovaszLoss

    n, c = 200, 5
    logits = rng.normal(size=(n, c)).astype(np.float32)
    labels = rng.integers(-1, c, n).astype(np.int32)
    mask = rng.random(n) > 0.2

    got = float(
        LovaszLoss()(jnp.asarray(logits), jnp.asarray(labels), mask=jnp.asarray(mask))
    )

    # dynamic-shape numpy reference
    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    valid = (labels != -1) & mask
    probs = softmax(logits)[valid]
    labs = labels[valid]
    losses = []
    for cls in range(c):
        fg = (labs == cls).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probs[:, cls])
        order = np.argsort(-errors)
        e_sorted, fg_sorted = errors[order], fg[order]
        gts = fg_sorted.sum()
        inter = gts - np.cumsum(fg_sorted)
        union = gts + np.cumsum(1 - fg_sorted)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((e_sorted * jac).sum())
    expected = float(np.mean(losses))
    assert got == pytest.approx(expected, rel=1e-4)
