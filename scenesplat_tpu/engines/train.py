"""Trainers (reference: pointcept/engines/train.py:35-374).

Hook-driven epoch/step loop around a jitted functional train step. The
reference's AMP autocast + GradScaler is replaced by bf16 compute dtype
(no scaler needed); DDP by pjit data-parallel sharding; per-rank loaders by a
single-controller loader whose batch dim is sharded over the mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.data import (
    ConcatDataset,
    Loader,
    MultiDatasetLoader,
    build_dataset,
)
from scenesplat_tpu.engines.hooks.default import HookBase, build_hooks
from scenesplat_tpu.engines.train_step import (
    create_train_state,
    make_train_step,
    point_from_batch,
)
from scenesplat_tpu.models import build_criteria, build_model
from scenesplat_tpu.parallel.mesh import (
    batch_sharding, create_mesh, put_global, replicated,
)
from scenesplat_tpu.utils.events import EventStorage
from scenesplat_tpu.utils.logger import get_root_logger
from scenesplat_tpu.utils.optimizer import build_optimizer, build_scheduler
from scenesplat_tpu.utils.registry import Registry

TRAINERS = Registry("trainers")


class TrainerBase:
    def __init__(self):
        self.hooks = []
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0
        self.comm_info = {}
        self.storage: Optional[EventStorage] = None
        self._pending_metrics = []
        self.metric_flush_interval = 8
        # host-side mirror of state.step: reading the device counter every
        # iteration (for lr logging / schedules) would host-fetch the
        # just-dispatched step output and re-serialize dispatch with
        # execution (~28 ms tunnel RPC each) — defeating deferred metrics
        self._host_step = 0

    def flush_metrics(self):  # overridden by trainers that defer fetches
        pass

    def register_hooks(self, hooks_cfg):
        self.hooks = build_hooks(hooks_cfg)
        for h in self.hooks:
            assert isinstance(h, HookBase)
            h.trainer = self

    def call_hooks(self, phase: str):
        for h in self.hooks:
            getattr(h, phase)()

    def train(self):
        try:
            with EventStorage() as self.storage:
                self.before_train()
                self.call_hooks("before_train")
                # one sync after hooks (CheckpointLoader may replace state)
                if getattr(self, "state", None) is not None:
                    self._host_step = int(jax.device_get(self.state.step))
                for self.epoch in range(self.start_epoch, self.max_epoch):
                    self.before_epoch()
                    self.call_hooks("before_epoch")
                    self.run_epoch()
                    self.flush_metrics()
                    self.call_hooks("after_epoch")
                self.call_hooks("after_train")
                self.after_train()
        except Exception:
            # crash tracebacks land in the train log, not just stderr
            # (reference ExceptionWriter, utils/events.py:590-602)
            import traceback

            logger = getattr(self, "logger", None)
            if logger is not None:
                logger.error("training crashed:\n%s", traceback.format_exc())
            raise

    # overridable
    def before_train(self):
        pass

    def before_epoch(self):
        pass

    def run_epoch(self):
        raise NotImplementedError

    def after_train(self):
        pass


@TRAINERS.register_module("DefaultTrainer")
class Trainer(TrainerBase):
    """Single-dataset trainer; task inferred from the model type."""

    TASKS = {
        "LangPretrainer": "lang",
        "DefaultSegmentorV2": "semseg",
        "PG-v1m1": "insseg",
        "MSC-v1m1": "msc",
        "MSC-v1m2": "msc",
        "PPT-v1m1": "ppt",
        "PPT-v1m2": "ppt",
        "CAC-v1m1": "cac",
    }

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.get("save_path", "exp/default"), "train.log")
        )
        self.max_epoch = cfg.get("epoch", 100)
        eval_epoch = cfg.get("eval_epoch")
        if eval_epoch:
            # reference defaults.py:123,147: train eval_epoch outer epochs,
            # each covering epoch // eval_epoch passes of the data via the
            # dataset's loop multiplier (so eval/checkpoint cadence is
            # eval_epoch, not one per data pass)
            assert self.max_epoch % eval_epoch == 0, (
                f"epoch ({self.max_epoch}) must be divisible by "
                f"eval_epoch ({eval_epoch})"
            )
            loop = self.max_epoch // eval_epoch
            tr = cfg.data.train
            preset = int(tr.get("loop", 1))
            if preset != 1 and loop > 1:
                # the reference OVERWRITES any preset loop
                # (defaults.py: cfg.data.train.loop = epoch // eval_epoch);
                # multiplying would train preset x more data passes
                self.logger.warning(
                    f"data.train.loop={preset} is overridden to "
                    f"{loop} by eval_epoch={eval_epoch} (reference "
                    "defaults.py semantics)"
                )
            if loop > 1:
                tr["loop"] = loop
            self.max_epoch = int(eval_epoch)
        self.metric_flush_interval = cfg.get("metric_flush_interval", 8)
        # mesh size must divide the global batch; use the largest such size
        batch_size = cfg.get("batch_size", 1)
        if not isinstance(batch_size, int) or batch_size < 1:
            raise TypeError(
                f"batch_size must be a positive int, got {batch_size!r} "
                "(check --options overrides)"
            )
        n_dev = jax.device_count()
        while batch_size % n_dev != 0:
            n_dev -= 1
        self.mesh = create_mesh(n_dev)
        self.logger.info(
            f"devices: {jax.device_count()} ({jax.default_backend()}), "
            f"mesh: {self.mesh.shape}"
        )

        model_cfg = dict(cfg.model)
        criteria_cfg = model_cfg.pop("criteria", None)
        self.task = cfg.get("task", self.TASKS.get(model_cfg.get("type"), "lang"))
        self.model = self._build_model(model_cfg)
        self.criteria = build_criteria(criteria_cfg)

        self.train_loader = self.build_train_loader()
        self.total_steps = len(self.train_loader) * self.max_epoch
        self.logger.info(
            f"train loader: {len(self.train_loader)} steps/epoch x "
            f"{self.max_epoch} epochs"
        )

        # two-phase optimizer build: params are needed for keyword groups
        example_batch = next(iter(self.train_loader))
        tx0 = build_optimizer(
            dict(cfg.optimizer), None, dict(cfg.get("scheduler") or {}) or None,
            self.total_steps, clip_grad=cfg.get("clip_grad"),
        )
        self.state = self._init_state(example_batch, tx0)
        self.tx = build_optimizer(
            dict(cfg.optimizer),
            self.state.params,
            dict(cfg.get("scheduler") or {}) or None,
            self.total_steps,
            param_dicts=[dict(p) for p in cfg.get("param_dicts") or []],
            clip_grad=cfg.get("clip_grad"),
        )
        self.state = self.state.replace(opt_state=self.tx.init(self.state.params))
        self.lr_schedule = (
            build_scheduler(
                dict(cfg.scheduler), self.total_steps, cfg.optimizer.get("lr", 1e-3)
            )
            if cfg.get("scheduler")
            else None
        )

        # input shardings come from device_put placement in run_step (batch
        # arrays sharded over 'data', scalars/state replicated)
        if cfg.get("aot_cache"):
            # opt-in on-disk executable cache (utils/aot_cache.py): the
            # Pallas-bearing train step is never persist-cached by the
            # tunneled TPU runtime (~25 min recompile per process at
            # flagship 32k); serialize_executable reuse makes it one-time.
            # One executable per input-shape signature (bucketed collate).
            self._raw_step = self._make_step()
            self._aot_execs = {}
            self._jit_step = self._aot_step
        else:
            self._jit_step = jax.jit(self._make_step(), donate_argnums=(0,))
        self._geom_builder = self._make_geom_builder()
        self.register_hooks(cfg.get("hooks"))

    def _aot_step(self, *args):
        from scenesplat_tpu.utils.aot_cache import cache_key, compile_cached

        key = cache_key("train-step", args, {})
        exe = self._aot_execs.get(key)
        if exe is None:
            exe = compile_cached(
                self._raw_step, *args,
                name="train-step", extra_key=str(self.cfg.get("name", "")),
                donate_argnums=(0,),
            )
            self._aot_execs[key] = exe
        return exe(*args)

    def _make_geom_builder(self):
        """Staged geometry-outside-the-step builder (cfg.split_geometry).

        Serialization + conv/pooling plans are int-only (no grads), and
        hoisting them out of the fused fwd+bwd program keeps each compile
        within the tunneled compile helper's memory cap at large N
        (CLAUDE.md round-1 notes). Each staged program is itself jitted and
        cached; results are bit-identical to the in-model path
        (tests/test_geometry_split.py)."""
        if not self.cfg.get("split_geometry") or self.task not in (
            "lang", "semseg",
        ):
            return None
        backbone_cfg = dict(self.cfg.model.get("backbone") or {})
        if not backbone_cfg:
            return None
        backbone = build_model(backbone_cfg)
        if not hasattr(backbone, "build_geometry_staged"):
            self.logger.warning(
                "split_geometry: backbone %s has no staged geometry builder; "
                "falling back to in-model serialization",
                backbone_cfg.get("type"),
            )
            return None
        shuffle = bool(backbone_cfg.get("shuffle_orders", True))
        base_rng = jax.random.PRNGKey(self.cfg.get("seed", 0) + 7)

        def build(point, step: int, stem_plan=None):
            key = jax.random.fold_in(base_rng, step) if shuffle else None
            return backbone.build_geometry_staged(
                point, shuffle_rng=key, stem_plan=stem_plan
            )

        return build

    # ---- override points (SSL pretrainer swaps these) -------------------
    def _build_model(self, model_cfg):
        return build_model(model_cfg)

    def _init_state(self, example_batch, tx0):
        # MSC consumes the raw two-view batch dict; point tasks a PointBatch
        example = (
            _to_jnp(example_batch)
            if self.task == "msc"
            else point_from_batch(_to_jnp(example_batch))
        )
        extra = (jnp.zeros((), jnp.int32),) if self.task == "ppt" else ()
        return create_train_state(
            self.model, tx0, example, seed=self.cfg.get("seed", 0),
            extra_args=extra,
        )

    def _make_step(self):
        return make_train_step(self.model, self.criteria, self.tx, task=self.task)

    # ---- data ----------------------------------------------------------
    def build_train_loader(self):
        dataset = build_dataset(dict(self.cfg.data.train))
        collate_fn = None
        if self.task == "msc":
            from scenesplat_tpu.data.collate import collate_two_view

            view_points = self.cfg.data.get("num_points", 65536)
            collate_fn = lambda samples: collate_two_view(samples, view_points)  # noqa: E731
        return Loader(
            dataset,
            batch_size=self.cfg.get("batch_size", 1),
            num_points=self.cfg.data.get("num_points", 65536),
            mix_prob=self.cfg.get("mix_prob", 0.0),
            seed=self.cfg.get("seed", 0),
            num_workers=self.cfg.get("num_worker", 4),
            collate_fn=collate_fn,
        )

    # ---- loop ------------------------------------------------------------
    def run_epoch(self):
        self.train_loader.set_epoch(self.epoch)
        sharding = batch_sharding(self.mesh)
        for batch in self.train_loader:
            self.call_hooks("before_step")
            self.run_step(batch, sharding)
            self.call_hooks("after_step")
            self.storage.step()

    def run_step(self, batch, sharding):
        # batches hold this process's LOCAL rows (the loaders slice by
        # parallel.mesh.local_batch_slice); put_global assembles the global
        # sharded array on multi-host runs and is a plain device_put on one
        device_batch = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                device_batch[k] = put_global(v, sharding)
            else:
                device_batch[k] = v
        device_batch["epoch_progress"] = put_global(
            np.float32((self.epoch + 1) / max(self.max_epoch, 1)),
            replicated(self.mesh),
        )
        if self._geom_builder is not None:
            from scenesplat_tpu.models.ptv3 import stem_plan_from_batch

            geometry = self._geom_builder(
                point_from_batch(device_batch), self._host_step,
                stem_plan=stem_plan_from_batch(device_batch),
            )
            self.state, metrics = self._jit_step(
                self.state, device_batch, geometry
            )
        else:
            self.state, metrics = self._jit_step(self.state, device_batch)
        # defer the host fetch: a float() per step would sync the tunnel's
        # ~28 ms RPC every iteration and serialize dispatch with execution.
        # Metrics stay on device and are fetched in one stacked transfer by
        # flush_metrics() (log steps, epoch end, or every flush_interval).
        self._pending_metrics.append((self.storage.iter, metrics))
        if self.lr_schedule is not None:
            self.storage.put_scalar(
                "lr", float(self.lr_schedule(self._host_step))
            )
        self._host_step += 1
        if len(self._pending_metrics) >= self.metric_flush_interval:
            self.flush_metrics()

    def flush_metrics(self):
        """Fetch all pending device metrics in one transfer and backfill the
        event storage at their recorded iterations."""
        if not self._pending_metrics:
            return
        pending, self._pending_metrics = self._pending_metrics, []
        keys = sorted(pending[0][1].keys())
        stacked = np.asarray(
            jnp.stack(
                [
                    jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys])
                    for _, m in pending
                ]
            )
        )  # [steps, keys] — single host fetch
        for (it, _), row in zip(pending, stacked):
            for k, v in zip(keys, row):
                self.storage.put_scalar_at(k, float(v), it)

    def after_train(self):
        self.logger.info("training finished")


@TRAINERS.register_module("MultiDatasetTrainer")
class MultiDatasetTrainer(Trainer):
    """Ratio-interleaved multi-dataset training (reference train.py:346-374)."""

    def build_train_loader(self):
        dataset = build_dataset(dict(self.cfg.data.train))
        assert isinstance(dataset, ConcatDataset)
        return MultiDatasetLoader(
            dataset,
            batch_size=self.cfg.get("batch_size", 1),
            num_points=self.cfg.data.get("num_points", 65536),
            mix_prob=self.cfg.get("mix_prob", 0.0),
            seed=self.cfg.get("seed", 0),
            num_workers=self.cfg.get("num_worker", 4),
        )


def _to_jnp(batch):
    import jax.numpy as jnp

    return {
        k: jnp.asarray(v) if isinstance(v, np.ndarray) else v
        for k, v in batch.items()
    }


def build_trainer(cfg):
    train_cfg = dict(cfg.get("train") or {"type": "DefaultTrainer"})
    kind = train_cfg.pop("type")
    return TRAINERS.get(kind)(cfg, **train_cfg)
