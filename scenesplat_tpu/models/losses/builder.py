"""Loss registry + summing Criteria (reference: pointcept/models/losses/builder.py:10-31)."""

from scenesplat_tpu.utils.registry import Registry

LOSSES = Registry("losses")


class Criteria:
    """Sums the configured losses; each loss decides which kwargs it uses."""

    def __init__(self, cfg=None):
        self.criteria = [LOSSES.build(c) for c in (cfg or [])]

    def __call__(self, pred, target, **kwargs):
        if not self.criteria:
            return pred
        total = 0.0
        for crit in self.criteria:
            total = total + crit(pred, target, **kwargs)
        return total


def build_criteria(cfg):
    return Criteria(cfg)
