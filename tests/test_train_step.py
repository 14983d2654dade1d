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
