"""Legacy DINO/iBOT losses: centering state, sinkhorn, masked weighting."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models.losses.dino_legacy import (
    DINOLoss,
    iBOTPatchLoss,
    sinkhorn_knopp_teacher,
)


def test_dino_loss_and_center_update():
    rng = np.random.default_rng(0)
    loss_mod = DINOLoss(out_dim=8)
    s = [jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))]
    t = [jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))]
    variables = loss_mod.init(jax.random.PRNGKey(0), s, t, 0.04)
    loss, updates = loss_mod.apply(
        variables, s, t, 0.04, mutable=["state"]
    )
    assert bool(jnp.isfinite(loss)) and float(loss) > 0
    c = updates["state"]["center"]
    expect = np.asarray(t[0]).mean(0, keepdims=True) * 0.1
    np.testing.assert_allclose(np.asarray(c), expect, rtol=1e-5, atol=1e-6)
    # identical distributions minimize CE: teacher==student logits scaled
    t2 = [s[0] * (0.04 / 0.1)]
    l_match, _ = loss_mod.apply(variables, s, t2, 0.04, mutable=["state"])
    l_rand, _ = loss_mod.apply(variables, s, t, 0.04, mutable=["state"])
    assert float(l_match) < float(l_rand)


def test_sinkhorn_assignment_columns_sum():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
    q = sinkhorn_knopp_teacher(t, 0.05, n_iterations=5)
    q = np.asarray(q)
    assert q.shape == (6, 5)
    np.testing.assert_allclose(q.sum(1), np.ones(6), rtol=1e-3)


def test_ibot_patch_loss_masking():
    rng = np.random.default_rng(2)
    loss_mod = iBOTPatchLoss(patch_out_dim=8)
    s = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    masks = jnp.asarray(np.array(
        [[True] * 4 + [False] * 6, [False] * 10]
    ))
    variables = loss_mod.init(jax.random.PRNGKey(0), s, t, masks, 0.04)
    loss, updates = loss_mod.apply(
        variables, s, t, masks, 0.04, mutable=["state"]
    )
    assert bool(jnp.isfinite(loss))
    # only masked tokens of sample 0 contribute; sample 1 contributes 0
    s2 = s.at[0, 4:].set(99.0).at[1].set(-99.0)
    loss2, _ = loss_mod.apply(variables, s2, t, masks, 0.04, mutable=["state"])
    s3 = s.at[0, :4].set(99.0)
    loss3, _ = loss_mod.apply(variables, s3, t, masks, 0.04, mutable=["state"])
    np.testing.assert_allclose(float(loss2), float(loss), rtol=1e-4)
    assert abs(float(loss3) - float(loss)) > 1e-3
