"""Train step + multi-chip dryrun on the forced 8-device CPU mesh."""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_train_step_decreases_loss(rng):
    from scenesplat_tpu.engines.train_step import (
        create_train_state,
        make_train_step,
        point_from_batch,
    )
    from scenesplat_tpu.models import build_model, build_criteria
    from scenesplat_tpu.utils.optimizer import build_optimizer
    from test_model import tiny_backbone_cfg

    model = build_model(dict(type="LangPretrainer", backbone=tiny_backbone_cfg()))
    criteria = build_criteria(
        [dict(type="CosineSimilarity"), dict(type="L2Loss")]
    )
    b, n = 2, 64
    coord = rng.uniform(0, 0.3, size=(b, n, 3)).astype(np.float32)
    batch = {
        "coord": jnp.asarray(coord),
        "feat": jnp.asarray(rng.normal(size=(b, n, 5)).astype(np.float32)),
        "grid_coord": jnp.asarray(np.floor(coord / 0.02).astype(np.int32)),
        "mask": jnp.ones((b, n), bool),
        "lang_feat": jnp.asarray(rng.normal(size=(b, n, 8)).astype(np.float32)),
        "valid_feat_mask": jnp.ones((b, n), bool),
        "segment": jnp.asarray(rng.integers(0, 4, size=(b, n)).astype(np.int32)),
        "epoch_progress": jnp.asarray(0.5, jnp.float32),
    }
    tx = build_optimizer(
        dict(type="AdamW", lr=1e-2, weight_decay=0.01),
        params=None,
        total_steps=50,
        clip_grad=1.0,
    )
    state = create_train_state(model, tx, point_from_batch(batch))
    step = jax.jit(make_train_step(model, criteria, tx, task="lang"))
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_train_step_with_prebuilt_geometry_matches():
    """train_step(state, batch, geometry) with staged-program geometry must
    match the in-model serialization path bit-for-bit (shuffle off)."""
    from scenesplat_tpu.engines.train_step import (
        create_train_state,
        make_train_step,
        point_from_batch,
    )
    from scenesplat_tpu.models import build_model, build_criteria
    from scenesplat_tpu.utils.optimizer import build_optimizer
    from test_model import tiny_backbone_cfg

    rng = np.random.default_rng(11)
    bb = tiny_backbone_cfg(shuffle_orders=False)
    model = build_model(dict(type="LangPretrainer", backbone=bb))
    backbone = build_model(dict(bb))
    criteria = build_criteria([dict(type="CosineSimilarity")])
    b, n = 2, 64
    coord = rng.uniform(0, 0.3, size=(b, n, 3)).astype(np.float32)
    batch = {
        "coord": jnp.asarray(coord),
        "feat": jnp.asarray(rng.normal(size=(b, n, 5)).astype(np.float32)),
        "grid_coord": jnp.asarray(np.floor(coord / 0.02).astype(np.int32)),
        "mask": jnp.ones((b, n), bool),
        "lang_feat": jnp.asarray(rng.normal(size=(b, n, 8)).astype(np.float32)),
        "valid_feat_mask": jnp.ones((b, n), bool),
    }
    # SGD: param delta == -lr * grad, so cross-program backward rounding stays
    # proportional (Adam's m/sqrt(v) turns an epsilon-grad sign flip into a
    # +-lr param jump, making param comparison meaningless)
    tx = build_optimizer(
        dict(type="SGD", lr=1e-2),
        params=None, total_steps=50, clip_grad=1.0,
    )
    state0 = create_train_state(model, tx, point_from_batch(batch))
    step = jax.jit(make_train_step(model, criteria, tx, task="lang"))

    s_ref, m_ref = step(state0, batch)
    geom = backbone.build_geometry_staged(point_from_batch(batch))
    s_geo, m_geo = step(state0, batch, geom)

    # geometry-as-input compiles a different XLA program than geometry-inline,
    # so backward float accumulation order may differ; demand equality only up
    # to rounding
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_geo["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_ref["grad_norm"]), float(m_geo["grad_norm"]), rtol=1e-5
    )
    for a, c in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_geo.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-7
        )


def test_param_group_labels():
    from scenesplat_tpu.utils.optimizer import _label_params

    params = {
        "enc0_block0": {"attn": {"qkv": {"kernel": np.zeros(3)}}},
        "embedding": {"conv": {"kernel": np.zeros(3)}},
    }
    labels = _label_params(params, [dict(keyword="block", lr=1e-4)])
    assert labels["enc0_block0"]["attn"]["qkv"]["kernel"] == "block"
    assert labels["embedding"]["conv"]["kernel"] == "default"


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
