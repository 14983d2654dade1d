"""Optimizer-step goldens vs the reference's own torch optimizers
(pointcept/utils/optimizer.py registers torch.optim.{SGD,Adam,AdamW}
verbatim): N update steps on identical params/grads must produce the same
trajectories — pinning betas/eps placement, decoupled-vs-L2 weight decay,
momentum accumulation, and per-group lr/weight_decay/momentum overrides
(reference optimizer.py:20-26)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")

from scenesplat_tpu.utils.optimizer import build_optimizer  # noqa: E402


def _trajectory_torch(opt_ctor, params_np, grads_np, steps):
    ps = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
    opt = opt_ctor(ps)
    out = []
    for s in range(steps):
        opt.zero_grad()
        for p, g in zip(ps, grads_np):
            p.grad = torch.from_numpy((g * (s + 1)).copy())
        opt.step()
        out.append([p.detach().numpy().copy() for p in ps])
    return out


def _trajectory_ours(cfg, params_np, grads_np, steps, param_dicts=None):
    params = {f"w{i}": jnp.asarray(p) for i, p in enumerate(params_np)}
    tx = build_optimizer(dict(cfg), params, param_dicts=param_dicts)
    state = tx.init(params)
    out = []
    for s in range(steps):
        grads = {
            f"w{i}": jnp.asarray(g) * (s + 1) for i, g in enumerate(grads_np)
        }
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        out.append([np.asarray(params[f"w{i}"]) for i in range(len(params_np))])
    return out


@pytest.fixture()
def tensors():
    rng = np.random.default_rng(0)
    params = [rng.normal(size=(4, 3)).astype(np.float32),
              rng.normal(size=(5,)).astype(np.float32)]
    grads = [rng.normal(size=p.shape).astype(np.float32) for p in params]
    return params, grads


def _compare(ref, ours, rtol=2e-5, atol=2e-6):
    for step_ref, step_ours in zip(ref, ours):
        for r, o in zip(step_ref, step_ours):
            np.testing.assert_allclose(o, r, rtol=rtol, atol=atol)


def test_adamw_golden(tensors):
    params, grads = tensors
    ref = _trajectory_torch(
        lambda ps: torch.optim.AdamW(ps, lr=1e-2, betas=(0.85, 0.97),
                                     eps=1e-6, weight_decay=0.07),
        params, grads, steps=8,
    )
    ours = _trajectory_ours(
        dict(type="AdamW", lr=1e-2, betas=(0.85, 0.97), eps=1e-6,
             weight_decay=0.07),
        params, grads, steps=8,
    )
    _compare(ref, ours)


def test_adam_l2_decay_golden(tensors):
    """torch.optim.Adam folds weight decay into the GRADIENT (L2), not the
    update — a decoupled implementation diverges immediately."""
    params, grads = tensors
    ref = _trajectory_torch(
        lambda ps: torch.optim.Adam(ps, lr=3e-3, weight_decay=0.1),
        params, grads, steps=8,
    )
    ours = _trajectory_ours(
        dict(type="Adam", lr=3e-3, weight_decay=0.1), params, grads, steps=8,
    )
    _compare(ref, ours)


def test_sgd_momentum_decay_golden(tensors):
    params, grads = tensors
    ref = _trajectory_torch(
        lambda ps: torch.optim.SGD(ps, lr=1e-2, momentum=0.9,
                                   weight_decay=1e-4),
        params, grads, steps=8,
    )
    ours = _trajectory_ours(
        dict(type="SGD", lr=1e-2, momentum=0.9, weight_decay=1e-4),
        params, grads, steps=8,
    )
    _compare(ref, ours)


def test_sgd_nesterov_golden(tensors):
    params, grads = tensors
    ref = _trajectory_torch(
        lambda ps: torch.optim.SGD(ps, lr=5e-3, momentum=0.8, nesterov=True),
        params, grads, steps=8,
    )
    ours = _trajectory_ours(
        dict(type="SGD", lr=5e-3, momentum=0.8, nesterov=True),
        params, grads, steps=8,
    )
    _compare(ref, ours)


def test_param_group_overrides_golden(tensors):
    """Keyword param groups with per-group lr AND weight_decay, exactly like
    the reference's param_dicts plumbing (reference optimizer.py:17-37 +
    flagship config block-lr group)."""
    params, grads = tensors

    def torch_ctor(ps):
        return torch.optim.AdamW(
            [dict(params=[ps[0]], lr=1e-2, weight_decay=0.05),
             dict(params=[ps[1]], lr=1e-3, weight_decay=0.0)],
            lr=1e-2, weight_decay=0.05,
        )

    ref = _trajectory_torch(torch_ctor, params, grads, steps=8)
    # our params are {"w0": ..., "w1": ...}; keyword "w1" forms the group
    ours = _trajectory_ours(
        dict(type="AdamW", lr=1e-2, weight_decay=0.05),
        params, grads, steps=8,
        param_dicts=[dict(keyword="w1", lr=1e-3, weight_decay=0.0)],
    )
    _compare(ref, ours)
