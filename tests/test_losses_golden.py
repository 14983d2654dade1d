"""Golden tests: our jnp losses vs the reference torch implementations.

The reference loss modules (pointcept/models/losses/{misc,lovasz}.py) are
pure torch, but importing them pulls the whole pointcept.models package,
whose backbones import CUDA-only deps (spconv, torch_scatter, flash_attn,
pointops, ...). Those are stubbed with inert placeholder modules — the loss
code itself never touches them.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import scenesplat_tpu.models.losses.misc as ours
from scenesplat_tpu.models.losses.lovasz import LovaszLoss as OurLovasz

from conftest import load_reference_package


def _load_reference_losses():
    misc = load_reference_package("pointcept.models.losses.misc")
    lovasz = load_reference_package("pointcept.models.losses.lovasz")
    if misc is None or lovasz is None:
        return None
    return misc, lovasz


_REF = _load_reference_losses()
pytestmark = pytest.mark.skipif(
    _REF is None, reason="reference losses unavailable"
)


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


def _cls_inputs(rng, n=257, c=13, ignore_frac=0.2):
    pred = rng.normal(size=(n, c)).astype(np.float32) * 2
    target = rng.integers(0, c, size=n).astype(np.int64)
    target[rng.random(n) < ignore_frac] = -1
    return pred, target


def test_cross_entropy_golden(rng, torch):
    ref_misc, _ = _REF
    pred, target = _cls_inputs(rng)
    ref = ref_misc.CrossEntropyLoss(loss_weight=1.3, ignore_index=-1)
    want = float(ref(torch.tensor(pred), torch.tensor(target)))
    got = float(
        ours.CrossEntropyLoss(loss_weight=1.3, ignore_index=-1)(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cross_entropy_smoothed_golden(rng, torch):
    # (class weights can't be golden-tested: the reference unconditionally
    # calls .cuda() on the weight tensor, misc.py:48)
    ref_misc, _ = _REF
    pred, target = _cls_inputs(rng, c=6)
    ref = ref_misc.CrossEntropyLoss(label_smoothing=0.1, ignore_index=-1)
    want = float(ref(torch.tensor(pred), torch.tensor(target)))
    got = float(
        ours.CrossEntropyLoss(label_smoothing=0.1, ignore_index=-1)(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_focal_loss_golden(rng, torch):
    ref_misc, _ = _REF
    pred, target = _cls_inputs(rng, c=7)
    ref = ref_misc.FocalLoss(gamma=2.0, alpha=0.5, loss_weight=1.0,
                             ignore_index=-1)
    want = float(ref(torch.tensor(pred), torch.tensor(target)))
    got = float(
        ours.FocalLoss(gamma=2.0, alpha=0.5, ignore_index=-1)(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_binary_focal_loss_golden(rng, torch):
    ref_misc, _ = _REF
    n = 301
    pred = rng.normal(size=n).astype(np.float32)
    target = (rng.random(n) > 0.5).astype(np.float32)
    ref = ref_misc.BinaryFocalLoss(gamma=2.0, alpha=0.25, logits=True)
    want = float(ref(torch.tensor(pred), torch.tensor(target)))
    got = float(
        ours.BinaryFocalLoss(gamma=2.0, alpha=0.25, logits=True)(
            jnp.asarray(pred), jnp.asarray(target)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dice_loss_golden(rng, torch):
    ref_misc, _ = _REF
    pred, target = _cls_inputs(rng, c=9, ignore_frac=0.0)
    ref = ref_misc.DiceLoss(smooth=1.0, exponent=2.0, ignore_index=-1)
    want = float(ref(torch.tensor(pred), torch.tensor(target)))
    got = float(
        ours.DiceLoss(smooth=1.0, exponent=2.0, ignore_index=-1)(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cosine_similarity_golden(rng, torch):
    ref_misc, _ = _REF
    n, d = 123, 16
    pred = rng.normal(size=(n, d)).astype(np.float32)
    target = rng.normal(size=(n, d)).astype(np.float32)
    vmask = rng.random(n) > 0.3
    ref = ref_misc.CosineSimilarity(loss_weight=0.7)
    want = float(
        ref(torch.tensor(pred), torch.tensor(target), torch.tensor(vmask))
    )
    got = float(
        ours.CosineSimilarity(loss_weight=0.7)(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(vmask)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_l2_loss_golden(rng, torch):
    ref_misc, _ = _REF
    n, d = 123, 16
    pred = rng.normal(size=(n, d)).astype(np.float32)
    target = rng.normal(size=(n, d)).astype(np.float32)
    vmask = rng.random(n) > 0.3
    ref = ref_misc.L2Loss(loss_weight=0.5)
    want = float(
        ref(torch.tensor(pred), torch.tensor(target), torch.tensor(vmask))
    )
    got = float(
        ours.L2Loss(loss_weight=0.5)(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(vmask)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "total,peak,pct,div,fdiv",
    [(1000, 6e-3, 0.05, 10.0, 1000.0), (137, 1e-2, 0.3, 25.0, 1e4)],
)
def test_onecycle_schedule_golden(torch, total, peak, pct, div, fdiv):
    # golden vs torch.optim.lr_scheduler.OneCycleLR (what the reference's
    # OneCycleLR subclasses verbatim, pointcept/utils/scheduler.py:100-135)
    import jax
    import torch.optim as optim

    from scenesplat_tpu.utils.optimizer import build_scheduler

    sched = build_scheduler(
        dict(type="OneCycleLR", max_lr=peak, pct_start=pct,
             div_factor=div, final_div_factor=fdiv),
        total_steps=total, base_lr=peak,
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = optim.SGD([p], lr=1.0)
    ts = optim.lr_scheduler.OneCycleLR(
        opt, max_lr=peak, total_steps=total, pct_start=pct,
        anneal_strategy="cos", div_factor=div, final_div_factor=fdiv,
    )
    want = []
    for _ in range(total):
        want.append(opt.param_groups[0]["lr"])
        opt.step()
        ts.step()
    got = np.asarray(jax.vmap(sched)(jnp.arange(total)))
    # fp32 schedule vs fp64 torch: tiny absolute slack near the final lr
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-9)


def test_lovasz_golden(rng, torch):
    _, ref_lovasz = _REF
    pred, target = _cls_inputs(rng, n=400, c=5)
    ref = ref_lovasz.LovaszLoss(mode="multiclass", ignore_index=-1)
    want = float(ref(torch.tensor(pred), torch.tensor(target)))
    got = float(
        OurLovasz(mode="multiclass", ignore_index=-1)(
            jnp.asarray(pred), jnp.asarray(target.astype(np.int32))
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
