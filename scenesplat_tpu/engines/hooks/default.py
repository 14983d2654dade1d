"""Hook base + registry (reference: pointcept/engines/hooks/default.py:1-26,
builder.py:4)."""

from scenesplat_tpu.utils.registry import Registry

HOOKS = Registry("hooks")


class HookBase:
    """Seven-phase training hook. ``self.trainer`` is set by the trainer."""

    trainer = None

    def before_train(self):
        pass

    def before_epoch(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass

    def after_epoch(self):
        pass

    def after_train(self):
        pass

    def _seed(self) -> int:
        """Config seed for deterministic per-scene transform RNG seeding."""
        try:
            return int(self.trainer.cfg.get("seed", 0))
        except AttributeError:
            return 0


def build_hooks(cfg_list):
    return [HOOKS.build(dict(c)) for c in (cfg_list or [])]
