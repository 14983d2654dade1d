"""Multi-step TRAIN-TRAJECTORY golden: our full jitted train step (model
fwd -> CE loss -> backward -> AdamW -> OneCycleLR) against the equivalent
torch loop over the reference SpUNet-v1m1 (spconv_unet_v1m1_base.py run
through the executable spconv stand-ins).

This is the integration check the per-piece goldens (model grads,
optimizer steps, LR trace, train-mode BN) compose into: K optimizer steps
from bridged weights must reproduce torch's per-step loss sequence AND the
final parameters/running stats. Mirrors the reference Trainer.run_step
(pointcept/engines/train.py:196-221: forward, backward, step, per-iter
scheduler.step()).

SGD+momentum (not AdamW) on purpose: the trajectory is then linear in the
gradients, so cross-framework fp32 rounding stays proportional. Adam's
m/sqrt(v) normalization turns epsilon-level grad noise on near-zero-grad
params into +-lr sign flips (see test_train_step.py), which makes exact
cross-framework multi-step comparison meaningless — AdamW's update math
is pinned separately in test_optimizer_golden.py."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

MINI = dict(
    in_channels=4,
    num_classes=5,
    base_channels=8,
    channels=(8, 16, 16, 8),
    layers=(1, 1, 1, 1),
)
STEPS = 6
LR = 1e-3
WD = 0.01


def test_train_trajectory_matches_reference():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.sparse_unet.spconv_unet_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(77)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)
    segment = rng.integers(0, MINI["num_classes"], size=n).astype(np.int64)

    # ---- torch loop: the reference runs BN in train mode, CE mean loss,
    # SGD+momentum over all params, OneCycleLR stepped once per iteration
    model = mod.SpUNetBase(**MINI)
    model.train()
    opt = torch.optim.SGD(
        model.parameters(), lr=LR, momentum=0.9, weight_decay=WD,
    )
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, total_steps=STEPS, pct_start=0.3,
        div_factor=25.0, final_div_factor=1e4, anneal_strategy="cos",
    )
    state0 = {k: v.detach().numpy().copy()
              for k, v in model.state_dict().items()}
    data = dict(
        grid_coord=torch.from_numpy(grid).int(),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    )
    seg_t = torch.from_numpy(segment)
    ce = torch.nn.CrossEntropyLoss(ignore_index=-1)
    ref_losses = []
    for _ in range(STEPS):
        opt.zero_grad()
        logits = model(dict(data))
        loss = ce(logits, seg_t)
        loss.backward()
        opt.step()
        sched.step()
        ref_losses.append(float(loss.detach()))
    state_final = {k: v.detach().numpy().copy()
                   for k, v in model.state_dict().items()}

    # ---- our loop: the jitted functional train step with bridged weights
    from scenesplat_tpu.engines.train_step import (
        create_train_state,
        make_train_step,
        point_from_batch,
    )
    from scenesplat_tpu.models import PointBatch, build_model, build_criteria
    from scenesplat_tpu.utils.ckpt_bridge import convert_spunet_checkpoint
    from scenesplat_tpu.utils.optimizer import build_optimizer

    ours_model = build_model(dict(
        type="SpUNet-v1m1", **MINI, stage_capacity=(0.5, 0.25),
    ))
    criteria = build_criteria([dict(
        type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1,
    )])
    batch = {
        "coord": jnp.asarray(grid, jnp.float32)[None] * 0.02,
        "feat": jnp.asarray(feat)[None],
        "grid_coord": jnp.asarray(grid)[None],
        "mask": jnp.ones((1, n), bool),
        "segment": jnp.asarray(segment.astype(np.int32))[None],
    }
    tx = build_optimizer(
        dict(type="SGD", lr=LR, momentum=0.9, weight_decay=WD),
        params=None,
        scheduler_cfg=dict(
            type="OneCycleLR", max_lr=LR, pct_start=0.3,
            div_factor=25.0, final_div_factor=1e4,
        ),
        total_steps=STEPS,
    )
    state = create_train_state(ours_model, tx, point_from_batch(batch))
    params, batch_stats, report = convert_spunet_checkpoint(
        state0, state.params, state.batch_stats, backbone_prefix="",
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    state = state.replace(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params),
    )
    step = jax.jit(make_train_step(ours_model, criteria, tx, task="semseg"))
    our_losses = []
    for _ in range(STEPS):
        state, metrics = step(state, batch)
        our_losses.append(float(metrics["loss"]))

    # per-step loss sequence: any divergence in grads, AdamW math, LR
    # schedule indexing, or BN running-stat updates compounds here
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=2e-5)

    # final params: bridge torch's end state and compare leaf-by-leaf
    ref_params, ref_stats, _ = convert_spunet_checkpoint(
        state_final,
        jax.tree_util.tree_map(np.zeros_like, params),
        jax.tree_util.tree_map(np.zeros_like, batch_stats),
        backbone_prefix="",
    )
    flat_ours = {
        "/".join(str(q) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    for path, v_ref in jax.tree_util.tree_flatten_with_path(ref_params)[0]:
        key = "/".join(str(q) for q in path)
        v_ref = np.asarray(v_ref)
        scale = max(np.abs(v_ref).max(), 1e-3)
        # step-0 grads agree to ~1.5e-6 (measured), but the trajectory is
        # chaotic: per-step fp32 noise is amplified through BN statistics +
        # momentum at the lr peak to ~1e-2 after 6 steps. The per-step LOSS
        # sequence above is the tight assertion; this is a coarse backstop
        # (a mis-wired schedule or optimizer moves params by the update
        # scale itself)
        np.testing.assert_allclose(
            flat_ours[key] / scale, v_ref / scale, rtol=5e-2, atol=5e-3,
            err_msg=f"param drift at {key}",
        )
    flat_stats = {
        "/".join(str(q) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(
            state.batch_stats)[0]
    }
    for path, v_ref in jax.tree_util.tree_flatten_with_path(ref_stats)[0]:
        key = "/".join(str(q) for q in path)
        np.testing.assert_allclose(
            flat_stats[key], np.asarray(v_ref), rtol=1e-2, atol=1e-4,
            err_msg=f"running-stat drift at {key}",
        )
