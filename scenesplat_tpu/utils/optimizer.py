"""Optimizer builders on optax.

Replaces the reference torch builders (pointcept/utils/optimizer.py:13-48 and
pointcept/utils/scheduler.py:8-139). Keyword param groups — e.g.
``param_dicts=[dict(keyword="block", lr=6e-4)]`` giving transformer blocks a
10x lower LR in the flagship config (configs/...contrastive.py:79) — map to
``optax.multi_transform`` with path-keyword labeling. Gradient allreduce is
implicit in pjit data parallelism, so the optimizer is device-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax


def _onecycle_two_phase(total_steps: int, pct_start: float,
                        start: float, mid: float, end: float,
                        anneal: str = "cos"):
    """torch.optim.lr_scheduler.OneCycleLR phase machinery, exactly:
    two annealing phases with boundaries at pct_start*T - 1 and T - 1
    (optax.cosine_onecycle_schedule places them at pct_start*T and T, which
    diverges up to ~18% relative near the end of training; golden-tested in
    tests/test_losses_golden.py::test_onecycle_schedule_golden). Used for
    both the lr cycle (initial -> max -> final) and, with cycle_momentum,
    the inverse momentum/beta1 cycle (max -> base -> max)."""
    phase1_end = float(pct_start * total_steps) - 1.0
    phase2_len = (total_steps - 1.0) - phase1_end

    if anneal == "cos":
        def _anneal(a, b, frac):
            return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * frac))
    else:  # "linear" (torch _annealing_linear)
        def _anneal(a, b, frac):
            return a + (b - a) * frac

    def schedule(step):
        step = jnp.minimum(jnp.asarray(step, jnp.float32), total_steps - 1.0)
        f1 = step / jnp.maximum(phase1_end, 1e-9)
        f2 = (step - phase1_end) / jnp.maximum(phase2_len, 1e-9)
        return jnp.where(
            step <= phase1_end,
            _anneal(start, mid, jnp.clip(f1, 0.0, 1.0)),
            _anneal(mid, end, jnp.clip(f2, 0.0, 1.0)),
        )

    return schedule


def _onecycle_cos_schedule(total_steps: int, peak: float, pct_start: float,
                           div_factor: float, final_div_factor: float,
                           anneal: str = "cos"):
    initial = peak / div_factor
    final = initial / final_div_factor
    return _onecycle_two_phase(
        total_steps, pct_start, initial, peak, final, anneal=anneal,
    )


def _onecycle_guards(cfg: Dict[str, Any], total_steps: int):
    """Shared degenerate-schedule guards for the lr and momentum cycles."""
    total_steps = max(total_steps, 2)
    pct_start = max(cfg.get("pct_start", 0.3), 1.0 / total_steps)
    return total_steps, pct_start


def build_momentum_schedule(scheduler_cfg: Optional[Dict[str, Any]],
                            total_steps: int):
    """torch OneCycleLR cycle_momentum (ON by default, reference
    scheduler.py:103-134 passes it straight through): momentum — SGD's
    ``momentum`` / Adam(W)'s ``beta1`` — anneals max_momentum ->
    base_momentum over the warmup phase and back, inversely to the lr, on
    the same phase boundaries. Returns None when not cycling."""
    if not scheduler_cfg or scheduler_cfg.get("type") != "OneCycleLR":
        return None
    if not scheduler_cfg.get("cycle_momentum", True):
        return None
    total_steps, pct_start = _onecycle_guards(scheduler_cfg, total_steps)
    base_m = float(scheduler_cfg.get("base_momentum", 0.85))
    max_m = float(scheduler_cfg.get("max_momentum", 0.95))
    return _onecycle_two_phase(
        total_steps, pct_start, max_m, base_m, max_m,
        anneal=scheduler_cfg.get("anneal_strategy", "cos"),
    )


def build_scheduler(cfg: Dict[str, Any], total_steps: int, base_lr: float):
    """Build a learning-rate schedule (reference scheduler.py registry)."""
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind == "OneCycleLR":
        max_lr = cfg.get("max_lr", base_lr)
        if isinstance(max_lr, (list, tuple)):
            max_lr = max_lr[0]
        # guard degenerate schedules: warmup must span >= 1 step
        total_steps, pct_start = _onecycle_guards(cfg, total_steps)
        return _onecycle_cos_schedule(
            total_steps=total_steps,
            peak=float(max_lr),
            pct_start=float(pct_start),
            div_factor=float(cfg.get("div_factor", 25.0)),
            final_div_factor=float(cfg.get("final_div_factor", 1e4)),
            anneal=cfg.get("anneal_strategy", "cos"),
        )
    if kind == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            init_value=base_lr, decay_steps=total_steps,
            alpha=cfg.get("eta_min", 0.0) / max(base_lr, 1e-12),
        )
    if kind == "PolyLR":
        # reference scheduler.py:69-76: lr_lambda = (1 - s/(T+1))**power —
        # note the T+1 denominator (lr never reaches exactly 0 at s=T)
        power = float(cfg.get("power", 0.9))

        def _poly(step):
            frac = 1.0 - jnp.asarray(step, jnp.float32) / (total_steps + 1.0)
            return base_lr * jnp.maximum(frac, 0.0) ** power

        return _poly
    if kind == "ExpLR":
        # reference scheduler.py:79-85: gamma ** (s / total_steps),
        # continuous (optax staircase=False default matches)
        return optax.exponential_decay(
            init_value=base_lr, transition_steps=total_steps,
            decay_rate=cfg.get("gamma", 0.9),
        )
    if kind == "MultiStepLR":
        # reference scheduler.py:8-25: torch MultiStepLR over FLOAT
        # milestones rate*T. torch applies gamma only when last_epoch is
        # EXACTLY a member of Counter(milestones) — so a fractional rate*T
        # NEVER fires (integer epochs never equal 11.1). Golden-pinned
        # foot-gun included: only integral milestones decay.
        milestones = [m * total_steps for m in cfg.get("milestones", [])]
        integral = jnp.asarray(
            [m for m in milestones if float(m) == int(m)], jnp.float32,
        )
        gamma = float(cfg.get("gamma", 0.1))

        def _multistep(step):
            n = jnp.sum(integral <= jnp.asarray(step, jnp.float32))
            return base_lr * gamma ** n.astype(jnp.float32)

        return _multistep
    if kind == "MultiStepWithWarmupLR":
        # reference scheduler.py:28-62: LambdaLR with per-step factor
        # warmup_coefficient(s) * gamma^(#milestones passed); milestones
        # use STRICT s < m_i in the break test, and the linear warmup ramps
        # from warmup_scale to 1 over warmup_rate*T (s <= bound inclusive)
        milestones = jnp.asarray(
            [m * total_steps for m in cfg.get("milestones", [])],
            jnp.float32,
        )
        gamma = float(cfg.get("gamma", 0.1))
        warmup_rate = float(cfg.get("warmup_rate", 0.05))
        warmup_scale = float(cfg.get("warmup_scale", 1e-6))
        warmup_end = warmup_rate * total_steps

        def _multistep_warmup(step):
            s = jnp.asarray(step, jnp.float32)
            n = jnp.sum(milestones <= s)
            factor = gamma ** n.astype(jnp.float32)
            wc = jnp.where(
                s <= warmup_end,
                1.0 - (1.0 - s / jnp.maximum(warmup_end, 1e-9))
                * (1.0 - warmup_scale),
                1.0,
            )
            return base_lr * wc * factor

        return _multistep_warmup
    raise ValueError(f"unknown scheduler type: {kind}")


def _label_params(params, param_dicts: Optional[List[Dict[str, Any]]]):
    """Assign each param a group label by path-keyword match."""
    keywords = [pd["keyword"] for pd in (param_dicts or [])]

    def label(path, _):
        path_str = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        for kw in keywords:
            if kw in path_str:
                return kw
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(
    cfg: Dict[str, Any],
    params,
    scheduler_cfg: Optional[Dict[str, Any]] = None,
    total_steps: int = 1,
    param_dicts: Optional[List[Dict[str, Any]]] = None,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    cfg = dict(cfg)
    kind = cfg.pop("type", "AdamW")
    base_lr = cfg.pop("lr", 1e-3)
    weight_decay = cfg.pop("weight_decay", 0.0)
    # torch OneCycleLR cycles SGD momentum / Adam(W) beta1 inversely to the
    # lr by default (cycle_momentum=True); every reference training config
    # runs with this on
    mom_schedule = build_momentum_schedule(scheduler_cfg, total_steps)

    def make_tx(lr: float, wd: float, momentum: Optional[float]):
        if scheduler_cfg is not None:
            sched_cfg = dict(scheduler_cfg)
            if "max_lr" in sched_cfg and isinstance(sched_cfg["max_lr"], (list, tuple)):
                # group peak values follow the group's base lr ratio
                sched_cfg["max_lr"] = lr
            schedule = build_scheduler(sched_cfg, total_steps, lr)
        else:
            schedule = lr
        betas = cfg.get("betas", (0.9, 0.999))
        eps = cfg.get("eps", 1e-8)
        if kind == "AdamW":
            # torch.optim.AdamW: decoupled decay, p -= lr*(adam_update + wd*p)
            if mom_schedule is not None:
                return optax.inject_hyperparams(optax.adamw)(
                    learning_rate=schedule, b1=mom_schedule,
                    b2=betas[1], eps=eps, weight_decay=wd,
                )
            return optax.adamw(
                schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd,
            )
        if kind == "Adam":
            # torch.optim.Adam: L2 decay folded into the gradient BEFORE the
            # moment updates (grad += wd * p)
            if mom_schedule is not None:
                inner = optax.inject_hyperparams(optax.adam)(
                    learning_rate=schedule, b1=mom_schedule,
                    b2=betas[1], eps=eps,
                )
            else:
                inner = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                inner,
            )
        if kind == "SGD":
            # torch.optim.SGD: grad += wd * p, then momentum accumulation
            if mom_schedule is not None:
                inner = optax.inject_hyperparams(optax.sgd)(
                    learning_rate=schedule, momentum=mom_schedule,
                    nesterov=cfg.get("nesterov", False),
                )
            else:
                inner = optax.sgd(
                    schedule,
                    momentum=momentum if momentum is not None
                    else cfg.get("momentum", 0.9),
                    nesterov=cfg.get("nesterov", False),
                )
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                inner,
            )
        raise ValueError(f"unknown optimizer type: {kind}")

    # reference param groups may override lr, weight_decay, and momentum per
    # keyword (reference optimizer.py:20-26)
    groups = {"default": (base_lr, weight_decay, None)}
    for pd in param_dicts or []:
        groups[pd["keyword"]] = (
            pd.get("lr", base_lr),
            pd.get("weight_decay", weight_decay),
            pd.get("momentum"),
        )

    if len(groups) == 1:
        tx = make_tx(*groups["default"])
    else:
        labels = _label_params(params, param_dicts)
        tx = optax.multi_transform(
            {name: make_tx(*args) for name, args in groups.items()}, labels
        )
    if clip_grad is not None and clip_grad > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return tx
