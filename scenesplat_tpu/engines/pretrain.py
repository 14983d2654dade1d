"""Self-supervised (SimDINO) pretraining engine.

Counterpart of the reference DefaultSSLPreTrainer
(pointcept/engines/pretrain.py:35-397): multi-crop student/teacher training
with per-step EMA teacher update and cosine-scheduled momentum / teacher
temperature. The teacher is an extra parameter tree in the train state; its
EMA update is a pure tree-map inside the jitted step (the reference's
torch._foreach_ loop, simdinov2.py:191-206).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from scenesplat_tpu.data import ConcatDataset, Loader, MultiDatasetLoader, build_dataset
from scenesplat_tpu.models import build_model
from scenesplat_tpu.models.ssl import (
    SimDINOSSL,
    cosine_patch_loss,
    generate_token_masks,
    mcr_loss,
)
from scenesplat_tpu.models.structure import PointBatch
from scenesplat_tpu.ops.segops import masked_mean_pool
from scenesplat_tpu.utils.registry import Registry
from .train import Trainer, TRAINERS

PRETRAINERS = Registry("pretrainers")


def cosine_scheduler(base: float, final: float, total_steps: int,
                     warmup_steps: int = 0, start_warmup: float = 0.0):
    """Step -> value schedule (reference pretrain.py:363-392)."""

    def fn(step):
        step = np.clip(step, 0, max(total_steps - 1, 1))
        if warmup_steps > 0 and step < warmup_steps:
            return start_warmup + (base - start_warmup) * step / warmup_steps
        t = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        return final + 0.5 * (base - final) * (1 + math.cos(math.pi * t))

    return fn


@flax.struct.dataclass
class SSLTrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    teacher_params: Any  # EMA copy of params['backbone_module']
    teacher_batch_stats: Any
    rng: jax.Array


def _point_from(batch, prefix):
    return PointBatch(
        coord=batch[f"{prefix}_coord"],
        feat=batch[f"{prefix}_feat"],
        grid_coord=batch[f"{prefix}_grid_coord"],
        mask=batch[f"{prefix}_mask"],
    )


def make_ssl_loss_fn(
    model: SimDINOSSL,
    local_crop_num: int = 3,
    do_ema: bool = True,
    do_ibot: bool = True,
    enable_mae: bool = False,
    dino_weight: float = 1.0,
    ibot_weight: float = 1.0,
    mae_weight: float = 1.0,
    mask_type: str = "patch",
    mask_grid_size: float = 0.2,
    mask_ratio_min_max=(0.1, 0.5),
    mask_sample_probability: float = 0.5,
) -> Callable:
    """Composed SimDINO loss (reference simdinov2.py:368-533): 2 masked
    global student passes + ``local_crop_num`` unmasked local passes +
    2 unmasked teacher passes -> MCR(dino) + cosine-patch(ibot) [+ mae].
    Standalone so parity tests can evaluate loss values without an
    optimizer step."""

    def run_backbone(params, batch_stats, point, token_mask, rngs):
        variables = {"params": params, "batch_stats": batch_stats}
        (dec, enc_feat, enc_mask), updates = model.apply(
            variables,
            point,
            True,
            token_mask,
            True,
            method=SimDINOSSL.backbone_apply,
            mutable=["batch_stats"],
            rngs=rngs,
        )
        return dec, enc_feat, enc_mask, updates["batch_stats"]

    def loss_fn(params, state: SSLTrainState, batch, rng):
        keys = jax.random.split(rng, 16)
        g0 = _point_from(batch, "global_crop0")
        g1 = _point_from(batch, "global_crop1")
        locals_ = [
            _point_from(batch, f"local_crop{i}") for i in range(local_crop_num)
        ]
        # injectable masks: a batch may carry precomputed token masks and
        # weights (determinism tests / golden parity vs the reference's
        # torch-RNG mask generator); otherwise generate on-device
        if "global_crop0_token_mask" in batch:
            tm0 = batch["global_crop0_token_mask"]
            w0 = batch["global_crop0_mask_weight"]
        else:
            tm0, w0 = generate_token_masks(
                keys[0], g0.coord, g0.mask, mask_type, mask_grid_size,
                mask_ratio_min_max, mask_sample_probability,
            )
        if "global_crop1_token_mask" in batch:
            tm1 = batch["global_crop1_token_mask"]
            w1 = batch["global_crop1_mask_weight"]
        else:
            tm1, w1 = generate_token_masks(
                keys[1], g1.coord, g1.mask, mask_type, mask_grid_size,
                mask_ratio_min_max, mask_sample_probability,
            )

        def rngs_at(i):
            return {"dropout": keys[2 + 2 * i], "shuffle": keys[3 + 2 * i]}

        # teacher: EMA backbone params, no token masking, no gradient
        if do_ema:
            tp = {**params, "backbone_module": state.teacher_params}
            tbs = {**state.batch_stats, "backbone_module": state.teacher_batch_stats}
            t_dec0, t_enc0, t_em0, new_tbs0 = run_backbone(tp, tbs, g0, None, rngs_at(0))
            tbs = {**tbs, "backbone_module": new_tbs0["backbone_module"]}
            t_dec1, t_enc1, t_em1, new_tbs1 = run_backbone(tp, tbs, g1, None, rngs_at(1))
            teacher_stats = new_tbs1["backbone_module"]
            t_pool0 = jax.lax.stop_gradient(masked_mean_pool(t_enc0, t_em0))
            t_pool1 = jax.lax.stop_gradient(masked_mean_pool(t_enc1, t_em1))
            t_tok0 = jax.lax.stop_gradient(t_dec0.feat)
            t_tok1 = jax.lax.stop_gradient(t_dec1.feat)
        else:
            teacher_stats = state.teacher_batch_stats

        # student: masked globals + unmasked locals
        bs = state.batch_stats
        s_dec0, s_enc0, s_em0, bs = run_backbone(params, bs, g0, tm0, rngs_at(2))
        s_dec1, s_enc1, s_em1, bs = run_backbone(params, bs, g1, tm1, rngs_at(3))
        s_pool = [masked_mean_pool(s_enc0, s_em0), masked_mean_pool(s_enc1, s_em1)]
        for i, lv in enumerate(locals_):
            _, l_enc, l_em, bs = run_backbone(params, bs, lv, None, rngs_at(4 + i))
            s_pool.append(masked_mean_pool(l_enc, l_em))

        head = lambda x: model.apply(
            {"params": params}, x, method=SimDINOSSL.apply_dino_head
        )
        ibot = lambda x: model.apply(
            {"params": params}, x, method=SimDINOSSL.apply_ibot_head
        )

        metrics = {}
        loss = 0.0
        if do_ema:
            s_heads = [head(p) for p in s_pool]
            t_heads = [head(t_pool0), head(t_pool1)]
            dino, mcr_metrics = mcr_loss(s_heads, t_heads)
            loss = loss + dino_weight * dino
            metrics.update(mcr_metrics)
            metrics["sim_dino_crops_loss"] = dino

        if do_ibot:
            s_tok = jnp.concatenate(
                [ibot(s_dec0.feat), ibot(s_dec1.feat)], axis=1
            ).reshape(-1, ibot(s_dec0.feat).shape[-1])
            t_tok = jnp.concatenate([ibot(t_tok0), ibot(t_tok1)], axis=1).reshape(
                -1, s_tok.shape[-1]
            )
            w = jnp.concatenate([w0 * tm0, w1 * tm1], axis=1).reshape(-1)
            ib = cosine_patch_loss(s_tok, t_tok, w, view_nums=1)
            loss = loss + ibot_weight * ib
            metrics["sim_ibot_patch_loss"] = ib

        if enable_mae:
            pred = model.apply(
                {"params": params}, s_dec0.feat, method=SimDINOSSL.apply_mae_head
            )
            gt = jax.lax.stop_gradient(batch["global_crop0_feat"])
            se = ((pred - gt) ** 2).mean(-1)
            denom = jnp.maximum(tm0.sum(), 1)
            mae = (se * tm0).sum() / denom
            loss = loss + mae_weight * mae
            metrics["global_mae_loss"] = mae

        metrics["loss"] = loss
        return loss, (bs, teacher_stats, metrics)

    return loss_fn


def make_ssl_train_step(
    model: SimDINOSSL,
    tx: optax.GradientTransformation,
    **loss_kwargs,
) -> Callable:
    loss_fn = make_ssl_loss_fn(model, **loss_kwargs)

    def train_step(state: SSLTrainState, batch, momentum: jnp.ndarray):
        rng = jax.random.fold_in(state.rng, state.step)
        (loss, (bs, tbs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA teacher over backbone params; mask_token excluded (reference
        # simdinov2.py:191-206 skips it)
        def ema(t, s, path=()):
            return jax.tree_util.tree_map(lambda a, b: momentum * a + (1 - momentum) * b, t, s)

        student_backbone = params["backbone_module"]
        teacher = ema(state.teacher_params, student_backbone)
        if "mask_token" in state.teacher_params:
            teacher = dict(teacher)
            teacher["mask_token"] = state.teacher_params["mask_token"]
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                batch_stats=bs,
                teacher_params=teacher,
                teacher_batch_stats=tbs,
            ),
            metrics,
        )

    return train_step


@TRAINERS.register_module("DefaultSSLPreTrainer")
@PRETRAINERS.register_module("DefaultSSLPreTrainer", force=True)
class DefaultSSLPreTrainer(Trainer):
    """SimDINO pretraining loop (reference pretrain.py:35-340)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        total = self.total_steps
        ssl = cfg.model
        self.momentum_schedule = cosine_scheduler(
            ssl.get("momentum_base", 0.994), ssl.get("momentum_final", 1.0), total
        )
        self.teacher_temp_schedule = cosine_scheduler(
            ssl.get("teacher_temp_base", 0.04),
            ssl.get("teacher_temp_final", 0.07),
            total,
            warmup_steps=int(0.1 * total),
            start_warmup=0.04,
        )

    # ---- model/step construction overrides ------------------------------
    def _build_model(self, model_cfg):
        ssl = dict(model_cfg)
        ssl.pop("type", None)
        self._wrapper_kwargs = dict(
            local_crop_num=ssl.pop("local_crop_num", 3),
            do_ema=ssl.pop("do_ema", True),
            do_ibot=ssl.pop("do_ibot", True),
            enable_mae=ssl.pop("enable_mae_loss", False),
            dino_weight=ssl.pop("dino_weight", 1.0),
            ibot_weight=ssl.pop("ibot_weight", 1.0),
            mae_weight=ssl.pop("mae_weight", 1.0),
            mask_type=ssl.pop("mask_type", "patch"),
            mask_grid_size=ssl.pop("mask_grid_size", 0.2),
            mask_ratio_min_max=tuple(ssl.pop("mask_ratio_min_max", (0.1, 0.5))),
            mask_sample_probability=ssl.pop("mask_sample_probability", 0.5),
        )
        ssl.pop("backbone_out_channels", None)
        ssl.pop("code_weight", None)
        backbone = ssl.pop("backbone")
        return SimDINOSSL(
            backbone=dict(backbone),
            enable_mae=self._wrapper_kwargs["enable_mae"],
            mae_out_dim=backbone.get("in_channels", 11),
            **{k: v for k, v in ssl.items() if k.startswith(("dino_", "ibot_"))},
        )

    def _make_step(self):
        return make_ssl_train_step(self.model, self.tx, **self._wrapper_kwargs)

    def _init_state(self, example_batch, tx0):
        import jax.numpy as jnp

        point = _point_from(
            {k: jnp.asarray(v) for k, v in example_batch.items()
             if isinstance(v, np.ndarray)},
            "global_crop0",
        )
        rng = jax.random.PRNGKey(self.cfg.get("seed", 0))
        variables = self.model.init(
            {"params": rng, "shuffle": jax.random.fold_in(rng, 1),
             "dropout": jax.random.fold_in(rng, 2)},
            point,
            train=False,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return SSLTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx0.init(params),
            batch_stats=batch_stats,
            # real copies: donated train-state buffers must not alias
            teacher_params=jax.tree_util.tree_map(
                jnp.copy, params["backbone_module"]
            ),
            teacher_batch_stats=jax.tree_util.tree_map(
                jnp.copy, batch_stats.get("backbone_module", {})
            ),
            rng=rng,
        )

    # Trainer.__init__ compatibility: it calls build_model(model_cfg) and
    # make_train_step; we intercept via the hooks below.
    def run_step(self, batch, sharding):
        # local rows -> global sharded arrays (multi-host safe, see Trainer)
        from scenesplat_tpu.parallel.mesh import put_global

        device_batch = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                device_batch[k] = put_global(v, sharding)
            else:
                device_batch[k] = v
        # host-side step mirror: fetching state.step here would block on the
        # previous step's output and re-serialize dispatch with execution
        momentum = jnp.asarray(
            self.momentum_schedule(self._host_step), jnp.float32
        )
        self.state, metrics = self._jit_step(self.state, device_batch, momentum)
        # deferred host fetch (see Trainer.run_step/flush_metrics)
        self._pending_metrics.append((self.storage.iter, metrics))
        if self.lr_schedule is not None:
            self.storage.put_scalar(
                "lr", float(self.lr_schedule(self._host_step))
            )
        self._host_step += 1
        if len(self._pending_metrics) >= self.metric_flush_interval:
            self.flush_metrics()

    def build_train_loader(self):
        from functools import partial

        from scenesplat_tpu.data.collate import collate_ssl

        dataset = build_dataset(dict(self.cfg.data.train))
        collate = partial(
            collate_ssl,
            global_points=self.cfg.data.get("num_points", 65536),
            local_points=self.cfg.data.get("num_points_local",
                                           self.cfg.data.get("num_points", 65536) // 4),
            local_crop_num=self.cfg.model.get("local_crop_num", 3),
        )
        return Loader(
            dataset,
            batch_size=self.cfg.get("batch_size", 1),
            num_points=self.cfg.data.get("num_points", 65536),
            seed=self.cfg.get("seed", 0),
            num_workers=self.cfg.get("num_worker", 4),
            collate_fn=collate,
        )
