"""Component registry.

A minimal string -> class registry used to build every configurable component
(models, datasets, transforms, hooks, trainers, testers) from plain dict
configs. Provides the same user-facing surface as the reference framework's
registry (reference: pointcept/utils/registry.py:9,59) without the mmcv
scope/parent machinery, which this framework does not need.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """Maps type names to callables and builds instances from dict configs."""

    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={list(self._module_dict)})"

    @property
    def name(self) -> str:
        return self._name

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register_module(self, name=None, module=None, force: bool = False):
        """Register a class/function, usable as decorator or direct call."""
        if module is not None:
            self._register(module, name=name, force=force)
            return module

        def _decorator(cls):
            self._register(cls, name=name, force=force)
            return cls

        return _decorator

    def _register(self, module, name=None, force=False):
        if not callable(module):
            raise TypeError(f"module must be callable, got {type(module)}")
        if name is None:
            names = [module.__name__]
        elif isinstance(name, str):
            names = [name]
        else:
            names = list(name)
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f"{n} is already registered in {self._name}")
            self._module_dict[n] = module

    def build(self, cfg: Dict[str, Any], **default_kwargs) -> Any:
        """Instantiate from a config dict with a 'type' key.

        Extra keyword arguments act as defaults that the config may override.
        """
        if cfg is None:
            return None
        if not isinstance(cfg, dict):
            raise TypeError(f"cfg must be a dict, got {type(cfg)}")
        if "type" not in cfg:
            raise KeyError(f"cfg must contain the key 'type': {cfg}")
        args = dict(default_kwargs)
        args.update(cfg)
        obj_type = args.pop("type")
        if isinstance(obj_type, str):
            obj_cls = self.get(obj_type)
            if obj_cls is None:
                raise KeyError(f"{obj_type} is not registered in {self._name}")
        elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
            obj_cls = obj_type
        else:
            raise TypeError(f"type must be a str or class, got {type(obj_type)}")
        return obj_cls(**args)


def build_from_cfg(cfg, registry: Registry, default_args: Optional[dict] = None):
    return registry.build(cfg, **(default_args or {}))
