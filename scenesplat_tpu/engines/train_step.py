"""Functional training step (jit/pjit-able core of the trainer).

Replaces the reference Trainer.run_step (pointcept/engines/train.py:196-221):
AMP autocast -> bf16 compute dtype in the model; GradScaler is unnecessary in
bf16; DDP allreduce -> implicit pjit collectives over the data mesh; clip-grad
and the OneCycle schedule live inside the optax chain.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from scenesplat_tpu.models.structure import PointBatch


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    example_point: PointBatch,
    seed: int = 0,
    extra_args: tuple = (),
) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rngs = {
        "params": jax.random.fold_in(rng, 0),
        "shuffle": jax.random.fold_in(rng, 1),
    }
    variables = model.init(init_rngs, example_point, *extra_args, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        rng=rng,
    )


def point_from_batch(batch: Dict[str, jnp.ndarray]) -> PointBatch:
    return PointBatch(
        coord=batch["coord"],
        feat=batch["feat"],
        grid_coord=batch["grid_coord"],
        mask=batch["mask"],
        cls_token=batch.get("cls_token"),
    )


def make_train_step(
    model,
    criteria: Callable,
    tx: optax.GradientTransformation,
    task: str = "lang",
) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    ``task``: "lang" (VL pretraining: criteria(feat, lang_feat, ...)),
    "semseg" (criteria(logits, segment)), or "insseg" (PointGroup: CE via
    criteria + bias L1/cosine, reference point_group_v1m1_base.py:72-95).
    """

    def loss_fn(params, batch_stats, batch, rngs, loss_rng, geometry=None):
        if task == "msc":
            # MSC consumes the raw two-view batch dict (views are padded
            # [B, N, ...] buffers) and returns its loss dict in-model,
            # mirroring the reference (masked_scene_contrast_v1m1_base.py).
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return out["loss"], updates["batch_stats"]
        point = point_from_batch(batch)
        if task == "cac":
            # CAC computes its four-term loss in-model (reference
            # context_aware_classifier_v1m1_base.py:203-246)
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                point,
                train=True,
                segment=batch["segment"],
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return out["loss"], updates["batch_stats"]
        if task == "ppt":
            # PPT passes the per-batch dataset condition to PDNorm-conditioned
            # backbones (reference point_prompt_training_v1m1:133-140)
            # one condition per batch (reference asserts this, ppt v1m1:134);
            # collate may deliver it as a [B] array — take element 0
            cond = jnp.asarray(
                batch.get("condition_index", 0), jnp.int32
            ).reshape(-1)[0]
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                point,
                cond,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            loss = criteria(out.feat, batch["segment"], mask=out.mask)
            return loss, updates["batch_stats"]
        geom_kw = {"geometry": geometry} if geometry is not None else {}
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            point,
            train=True,
            rngs=rngs,
            mutable=["batch_stats"],
            **geom_kw,
        )
        if task == "insseg":
            from scenesplat_tpu.models.point_group import pointgroup_loss

            out_point, bias_pred = out
            loss, _ = pointgroup_loss(
                out_point.feat, bias_pred, out_point.coord,
                batch["segment"], batch["instance"],
                batch["instance_centroid"], out_point.mask, criteria=criteria,
            )
        elif task == "lang":
            loss = criteria(
                out.feat,
                # targets may arrive half-precision (collate ships SigLIP2
                # lang_feat as f16); the upcast is exact
                batch["lang_feat"].astype(jnp.float32),
                valid_feat_mask=batch.get("valid_feat_mask"),
                mask=out.mask,
                segment=batch.get("segment"),
                epoch_progress=batch.get("epoch_progress"),
                rng=loss_rng,
            )
        elif task == "semseg":
            loss = criteria(out.feat, batch["segment"], mask=out.mask)
        else:
            raise ValueError(f"unknown task: {task}")
        return loss, updates["batch_stats"]

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   geometry=None):
        """``geometry``: optional prebuilt PTv3Geometry (int-only pytree from
        the staged per-step programs, models/ptv3.py:build_ptv3_geometry_staged).
        Hoisting it out of this jitted program keeps the fwd+bwd compile
        within the tunneled compile helper's memory cap at large N, and the
        geometry carries no gradients anyway."""
        rng = jax.random.fold_in(state.rng, state.step)
        k_drop, k_shuffle, k_loss = jax.random.split(rng, 3)
        rngs = {"dropout": k_drop, "shuffle": k_shuffle}
        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rngs, k_loss, geometry)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_batch_stats,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        point = point_from_batch(batch)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            point,
            train=False,
        )
        return out.feat, out.mask

    return eval_step
