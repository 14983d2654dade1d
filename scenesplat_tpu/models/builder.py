"""MODELS registry (reference: pointcept/models/builder.py:11-16)."""

from scenesplat_tpu.utils.registry import Registry

MODELS = Registry("models")


def build_model(cfg, **kwargs):
    return MODELS.build(cfg, **kwargs)
