"""Hook registry package (reference: pointcept/engines/hooks/builder.py:4)."""
from .default import HOOKS, HookBase, build_hooks
from . import misc as _misc  # noqa: F401  (registers hooks)
from . import evaluator as _evaluator  # noqa: F401

__all__ = ["HOOKS", "HookBase", "build_hooks"]
