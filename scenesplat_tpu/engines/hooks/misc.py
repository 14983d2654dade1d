"""Common hooks (reference: pointcept/engines/hooks/misc.py).

CheckpointSaver/Loader use orbax with the reference's last/best semantics:
atomic directory write, ``model_last`` every eval epoch, ``model_best`` copied
when the tracked metric (e.g. fg_mIoU) improves (reference misc.py:146-300).
"""

from __future__ import annotations

import os
import shutil
import time

import jax
import numpy as np

from scenesplat_tpu.utils.logger import get_root_logger
from .default import HOOKS, HookBase


@HOOKS.register_module()
class IterationTimer(HookBase):
    """data/batch timing + ETA (reference misc.py:32-75)."""

    def __init__(self, warmup_iter: int = 2):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._iter_start = time.perf_counter()

    def before_train(self):
        self._start_time = time.perf_counter()

    def before_epoch(self):
        self._iter_start = time.perf_counter()

    def before_step(self):
        data_time = time.perf_counter() - self._iter_start
        self.trainer.storage.put_scalar("data_time", data_time)

    def after_step(self):
        batch_time = time.perf_counter() - self._iter_start
        self._iter_start = time.perf_counter()
        self.trainer.storage.put_scalar("batch_time", batch_time)


@HOOKS.register_module()
class InformationWriter(HookBase):
    """Console + JSON metrics emission (reference misc.py:78-143)."""

    def __init__(self, log_interval: int = 10):
        self.log_interval = log_interval

    def before_train(self):
        from scenesplat_tpu.utils.events import JSONWriter, TensorboardWriter

        save_path = self.trainer.cfg.get("save_path", "exp/default")
        self.json_writer = JSONWriter(os.path.join(save_path, "metrics.json"))
        self.tb_writer = TensorboardWriter(os.path.join(save_path, "tb"))

    def after_step(self):
        storage = self.trainer.storage
        if storage.iter % self.log_interval == 0:
            self.trainer.flush_metrics()  # pull deferred device metrics
            lr = storage.latest.get("lr")
            msgs = [
                f"epoch {self.trainer.epoch + 1}/{self.trainer.max_epoch}",
                f"iter {storage.iter}",
            ]
            for key in ("loss", "grad_norm", "data_time", "batch_time"):
                if key in storage.latest:
                    msgs.append(f"{key}: {storage.latest[key]:.4g}")
            if lr is not None:
                msgs.append(f"lr: {lr:.3e}")
            self.trainer.logger.info("  ".join(msgs))
            self.json_writer.write(storage)
            self.tb_writer.write(storage)

    def after_epoch(self):
        self.json_writer.write(self.trainer.storage)
        self.tb_writer.write(self.trainer.storage)

    def after_train(self):
        self.json_writer.close()
        self.tb_writer.close()


def _extra_state_fields(state):
    """Trainer-state fields beyond the shared train-state layout (e.g. the
    SSL pretrainer's EMA teacher) as a dict for checkpointing."""
    import dataclasses

    shared = ("params", "opt_state", "batch_stats", "step", "rng")
    try:
        fields = dataclasses.fields(state)
    except TypeError:
        return {}
    return {
        f.name: getattr(state, f.name)
        for f in fields
        if f.name not in shared
    }


@HOOKS.register_module()
class CheckpointSaver(HookBase):
    """Save model_last each epoch and copy model_best when the metric improves
    (reference misc.py:146-204)."""

    def __init__(self, save_freq=None):
        self.save_freq = save_freq

    def before_train(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()
        self.ckpt_dir = os.path.abspath(
            os.path.join(self.trainer.cfg.get("save_path", "exp/default"), "model")
        )
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def _save(self, name: str):
        path = os.path.join(self.ckpt_dir, name)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        state = self.trainer.state
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "step": state.step,
            "rng": state.rng,
            "meta": {
                "epoch": np.asarray(self.trainer.epoch + 1),
                "best_metric": np.asarray(
                    self.trainer.comm_info.get("best_metric_value", -1.0)
                ),
            },
        }
        extra = _extra_state_fields(state)
        if extra:
            # trainer-specific state beyond the shared layout — e.g. the SSL
            # pretrainer's EMA teacher (the reference checkpoints the whole
            # module state dict, teacher included, hooks/misc.py:146-204)
            payload["extra"] = extra
        self._ckptr.save(tmp, payload)
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)

    def after_epoch(self):
        metric = self.trainer.comm_info.get("current_metric_value")
        best = self.trainer.comm_info.get("best_metric_value", -np.inf)
        is_best = metric is not None and metric > best
        if is_best:
            self.trainer.comm_info["best_metric_value"] = metric
            name = self.trainer.comm_info.get("current_metric_name", "metric")
            self.trainer.logger.info(
                f"new best {name}: {metric:.4f} (epoch {self.trainer.epoch + 1})"
            )
        self._save("model_last")
        if is_best:
            best_path = os.path.join(self.ckpt_dir, "model_best")
            if os.path.exists(best_path):
                shutil.rmtree(best_path)
            shutil.copytree(os.path.join(self.ckpt_dir, "model_last"), best_path)
        if self.save_freq and (self.trainer.epoch + 1) % self.save_freq == 0:
            self._save(f"epoch_{self.trainer.epoch + 1}")


@HOOKS.register_module()
class CheckpointLoader(HookBase):
    """Resume / warm-start (reference misc.py:207-300): restores params (+
    optimizer/epoch when resume=True) from cfg.weight."""

    def __init__(self, keywords="", replacement=None, strict=False):
        self.keywords = keywords
        self.replacement = replacement if replacement is not None else keywords
        self.strict = strict

    def before_train(self):
        import orbax.checkpoint as ocp

        weight = self.trainer.cfg.get("weight")
        if not weight:
            return
        if not os.path.exists(weight):
            raise FileNotFoundError(f"checkpoint not found: {weight}")
        self.trainer.logger.info(f"loading checkpoint: {weight}")
        ckptr = ocp.StandardCheckpointer()
        state = self.trainer.state
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "step": state.step,
            "rng": state.rng,
            "meta": {
                "epoch": np.asarray(0),
                "best_metric": np.asarray(-1.0),
            },
        }
        extra_template = _extra_state_fields(state)
        if extra_template:
            template["extra"] = extra_template
        try:
            payload = ckptr.restore(os.path.abspath(weight), template)
        except Exception:
            # checkpoint without the extra section (different trainer type
            # or older layout): retry with the shared layout only
            template.pop("extra", None)
            payload = ckptr.restore(os.path.abspath(weight), template)
        resume = self.trainer.cfg.get("resume", False)
        new_state = state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"]
        )
        if "extra" in payload:
            new_state = new_state.replace(**payload["extra"])
        if resume:
            new_state = new_state.replace(
                opt_state=payload["opt_state"],
                step=payload["step"],
                rng=payload["rng"],
            )
            self.trainer.start_epoch = int(payload["meta"]["epoch"])
            self.trainer.comm_info["best_metric_value"] = float(
                payload["meta"]["best_metric"]
            )
        # restored arrays land on a single device; re-replicate over the
        # trainer's mesh or the first sharded train step fails with
        # "incompatible devices" on any multi-chip mesh
        mesh = getattr(self.trainer, "mesh", None)
        if mesh is not None and mesh.size > 1:
            import jax

            from scenesplat_tpu.parallel.mesh import put_global, replicated

            sharding = replicated(mesh)
            new_state = jax.tree_util.tree_map(
                lambda x: put_global(x, sharding), new_state
            )
        self.trainer.state = new_state
        self.trainer.logger.info(
            f"checkpoint loaded (resume={resume}, epoch={self.trainer.start_epoch})"
        )


@HOOKS.register_module()
class PreciseEvaluator(HookBase):
    """Run the configured testers after training (reference misc.py:303-352),
    loading model_best unless ``test_last``."""

    def __init__(self, test_last: bool = False):
        self.test_last = test_last

    def after_train(self):
        import orbax.checkpoint as ocp

        from scenesplat_tpu.engines.test import build_tester

        cfg = self.trainer.cfg
        test_cfgs = cfg.get("test")
        data_test = cfg.data.get("test")
        if not test_cfgs or data_test is None:
            return
        test_cfgs = test_cfgs if isinstance(test_cfgs, (list, tuple)) else [test_cfgs]
        data_cfgs = (
            data_test if isinstance(data_test, (list, tuple)) else [data_test]
        )
        state = self.trainer.state
        if not self.test_last:
            best = os.path.join(
                cfg.get("save_path", "exp/default"), "model", "model_best"
            )
            if os.path.exists(best):
                ckptr = ocp.StandardCheckpointer()
                template = {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "batch_stats": state.batch_stats,
                    "step": state.step,
                    "rng": state.rng,
                    "meta": {
                        "epoch": np.asarray(0),
                        "best_metric": np.asarray(-1.0),
                    },
                }
                extra_template = _extra_state_fields(state)
                if extra_template:
                    template["extra"] = extra_template
                try:
                    payload = ckptr.restore(os.path.abspath(best), template)
                except Exception:
                    template.pop("extra", None)
                    payload = ckptr.restore(os.path.abspath(best), template)
                state = state.replace(
                    params=payload["params"], batch_stats=payload["batch_stats"]
                )
                self.trainer.logger.info("PreciseEvaluator: loaded model_best")
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        backbone_cfg = cfg.model.get("backbone", cfg.model)
        patch = max(backbone_cfg.get("enc_patch_size", [1024]))
        for tc, dc in zip(test_cfgs, data_cfgs):
            tester = build_tester(
                tc, self.trainer.model, variables, dc, patch_size=patch,
                seed=cfg.get("seed", 0),
            )
            tester.test()


@HOOKS.register_module()
class RuntimeProfiler(HookBase):
    """Capture a jax profiler trace of a few training steps (reference
    RuntimeProfiler/V2, hooks/misc.py:442-591 wrap torch.profiler). The trace
    is viewable in TensorBoard / Perfetto."""

    def __init__(self, start_step: int = 3, num_steps: int = 2, exit_after: bool = False):
        self.start_step = start_step
        self.num_steps = num_steps
        self.exit_after = exit_after
        self._active = False

    def before_step(self):
        import jax

        step = self.trainer.storage.iter
        if step == self.start_step:
            path = os.path.join(
                self.trainer.cfg.get("save_path", "exp/default"), "profile"
            )
            os.makedirs(path, exist_ok=True)
            jax.profiler.start_trace(path)
            self._active = True
            self.trainer.logger.info(f"profiler trace started -> {path}")

    def after_step(self):
        import jax

        step = self.trainer.storage.iter
        if self._active and step >= self.start_step + self.num_steps - 1:
            jax.profiler.stop_trace()
            self._active = False
            self.trainer.logger.info("profiler trace stopped")
            if self.exit_after:
                raise SystemExit(0)


@HOOKS.register_module()
class BeginningEvaluator(HookBase):
    """Run evaluator hooks once before training starts (reference
    hooks/misc.py:355-404), e.g. to score a loaded checkpoint."""

    def before_train(self):
        for h in self.trainer.hooks:
            if h is not self and hasattr(h, "after_epoch") and "Eval" in type(h).__name__:
                self.trainer.epoch = -1
                h.after_epoch()
                self.trainer.epoch = self.trainer.start_epoch


@HOOKS.register_module()
class DataCacheOperator(HookBase):
    """Prewarm the OS page cache for the training split (reference
    hooks/misc.py:407-439 copies scenes into /dev/shm; page-cache warming is
    the portable equivalent)."""

    def __init__(self, data_root=None, split=None):
        self.data_root = data_root
        self.split = split

    def before_train(self):
        import glob

        root = self.data_root or self.trainer.cfg.data.train.get("data_root")
        splits = self.split or self.trainer.cfg.data.train.get("split", "train")
        if isinstance(splits, str):
            splits = [splits]
        n = 0
        for split in splits:
            for path in glob.glob(os.path.join(root, split, "*", "*.npy")):
                with open(path, "rb") as f:
                    while f.read(1 << 22):
                        pass
                n += 1
        self.trainer.logger.info(f"page-cache warmed for {n} asset files")
