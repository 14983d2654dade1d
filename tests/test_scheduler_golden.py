"""Scheduler goldens vs the reference's own scheduler registry
(pointcept/utils/scheduler.py): per-step LR traces for all six registered
schedulers, the OneCycleLR momentum cycle (torch cycles SGD momentum /
Adam(W) beta1 inversely to the lr, ON by default), and end-to-end cycled
AdamW/SGD update trajectories on identical grads."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402

torch = pytest.importorskip("torch")

from scenesplat_tpu.utils.optimizer import (  # noqa: E402
    build_momentum_schedule,
    build_optimizer,
    build_scheduler,
)

T = 37
BASE_LR = 0.02


@pytest.fixture(scope="module")
def ref_sched():
    # torch >= 2.7 removed the deprecated `verbose` kwarg the reference
    # still forwards to the base constructors — strip it via a shim
    import inspect
    from torch.optim import lr_scheduler

    for cls in (lr_scheduler.MultiStepLR, lr_scheduler.LambdaLR,
                lr_scheduler.CosineAnnealingLR, lr_scheduler.OneCycleLR):
        init = cls.__init__
        if "verbose" in inspect.signature(init).parameters:
            continue
        if getattr(init, "_verbose_shim", False):
            continue

        def make(orig):
            def shim(self, *a, **k):
                k.pop("verbose", None)
                return orig(self, *a, **k)
            shim._verbose_shim = True
            return shim

        cls.__init__ = make(init)
    mod = load_reference_package("pointcept.utils.scheduler")
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


def _ref_lr_trace(ref_sched, name, steps=T, lr=BASE_LR, **kwargs):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr, momentum=0.9)
    sched = getattr(ref_sched, name)(optimizer=opt, total_steps=steps,
                                     **kwargs)
    out = []
    for _ in range(steps):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(out)


CASES = [
    # fractional milestones (0.3*37=11.1): torch's exact-membership test
    # means they NEVER fire — the trace must stay flat
    ("MultiStepLR", dict(milestones=[0.3, 0.7], gamma=0.3)),
    # dyadic rates at steps=36 give exactly-integral milestones (18.0,
    # 27.0) — the decay DOES fire
    ("MultiStepLR", dict(milestones=[0.5, 0.75], gamma=0.3, steps=36)),
    ("MultiStepWithWarmupLR",
     dict(milestones=[0.4, 0.8], gamma=0.5, warmup_rate=0.1,
          warmup_scale=1e-6)),
    ("PolyLR", dict(power=0.9)),
    ("ExpLR", dict(gamma=0.1)),
    ("CosineAnnealingLR", dict(eta_min=1e-5)),
    ("OneCycleLR", dict(max_lr=BASE_LR, pct_start=0.3, div_factor=25.0,
                        final_div_factor=1e4, anneal_strategy="cos")),
    ("OneCycleLR", dict(max_lr=BASE_LR, pct_start=0.2, div_factor=10.0,
                        final_div_factor=1e3, anneal_strategy="linear")),
]


@pytest.mark.parametrize("name,kwargs", CASES,
                         ids=[f"{i}-{n}-{k.get('anneal_strategy','')}"
                              for i, (n, k) in enumerate(CASES)])
def test_lr_trace_matches_reference(ref_sched, name, kwargs):
    kwargs = dict(kwargs)
    steps = kwargs.pop("steps", T)
    ref = _ref_lr_trace(ref_sched, name, steps=steps, **kwargs)
    sched = build_scheduler(dict(type=name, **kwargs), steps, BASE_LR)
    ours = np.asarray([float(sched(i)) for i in range(steps)])
    # ours computes in fp32 (device schedules), torch in fp64
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-9)


@pytest.mark.parametrize("flavor", ["sgd", "adamw"])
def test_onecycle_momentum_trace_matches_torch(flavor):
    """torch OneCycleLR with cycle_momentum=True anneals max_momentum ->
    base_momentum -> max_momentum on the lr phase boundaries; for Adam(W)
    it rewrites beta1 each step."""
    p = torch.nn.Parameter(torch.zeros(1))
    if flavor == "sgd":
        opt = torch.optim.SGD([p], lr=BASE_LR, momentum=0.9)
        read = lambda: opt.param_groups[0]["momentum"]  # noqa: E731
    else:
        opt = torch.optim.AdamW([p], lr=BASE_LR)
        read = lambda: opt.param_groups[0]["betas"][0]  # noqa: E731
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=BASE_LR, total_steps=T, pct_start=0.3,
        base_momentum=0.85, max_momentum=0.95,
    )
    ref = []
    for _ in range(T):
        ref.append(read())
        opt.step()
        sched.step()
    ours_sched = build_momentum_schedule(
        dict(type="OneCycleLR", max_lr=BASE_LR, pct_start=0.3,
             base_momentum=0.85, max_momentum=0.95), T,
    )
    ours = np.asarray([float(ours_sched(i)) for i in range(T)])
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-6, atol=1e-9)


def test_momentum_schedule_off_switch():
    assert build_momentum_schedule(
        dict(type="OneCycleLR", cycle_momentum=False), T) is None
    assert build_momentum_schedule(dict(type="PolyLR"), T) is None
    assert build_momentum_schedule(None, T) is None


@pytest.mark.parametrize("kind", ["AdamW", "SGD"])
def test_cycled_update_trajectory_matches_torch(kind):
    """End-to-end: K optimizer steps under OneCycleLR WITH momentum cycling
    on identical synthetic grads — pins the inject_hyperparams wiring (lr
    and beta1/momentum both follow their cycles inside the jitted chain)."""
    steps = 8
    rng = np.random.default_rng(3)
    params_np = [rng.normal(size=(4, 3)).astype(np.float32),
                 rng.normal(size=(5,)).astype(np.float32)]
    grads_np = [rng.normal(size=p.shape).astype(np.float32)
                for p in params_np]

    ps = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
    if kind == "AdamW":
        opt = torch.optim.AdamW(ps, lr=BASE_LR, weight_decay=0.01)
    else:
        opt = torch.optim.SGD(ps, lr=BASE_LR, momentum=0.9,
                              weight_decay=0.01)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=BASE_LR, total_steps=steps, pct_start=0.3,
    )
    ref = []
    for s in range(steps):
        opt.zero_grad()
        for p, g in zip(ps, grads_np):
            p.grad = torch.from_numpy((g * (s + 1)).copy())
        opt.step()
        sched.step()
        ref.append([p.detach().numpy().copy() for p in ps])

    params = {f"w{i}": jnp.asarray(p) for i, p in enumerate(params_np)}
    tx = build_optimizer(
        dict(type=kind, lr=BASE_LR, weight_decay=0.01, momentum=0.9),
        params,
        scheduler_cfg=dict(type="OneCycleLR", max_lr=BASE_LR, pct_start=0.3),
        total_steps=steps,
    )
    state = tx.init(params)
    for s in range(steps):
        grads = {f"w{i}": jnp.asarray(g) * (s + 1)
                 for i, g in enumerate(grads_np)}
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        for i, r in enumerate(ref[s]):
            np.testing.assert_allclose(
                np.asarray(params[f"w{i}"]), r, rtol=2e-5, atol=2e-6,
                err_msg=f"{kind} step {s} w{i}",
            )
