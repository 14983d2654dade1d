"""On-disk AOT executable cache (jax.experimental.serialize_executable).

The tunneled TPU runtime's persistent compile cache skips any program
containing custom calls, so Pallas-bearing programs (the flagship train
step: ~25 min of Mosaic compile) are recompiled by every process. JAX can
serialize the POST-compile executable; cross-process reuse was adjudicated
on the real runtime 2026-08-20 (probe_aot_tpu.py: child load 0.29 s,
bit-identical result). This module wraps that in a keyed disk cache so each
(program, shapes, platform) compiles once EVER per machine.

Scope: opt-in per call site (the bench train path and tools/train.py's jit
step). Keys bake in the jax version + backend + a caller-supplied config
fingerprint; stale entries fail deserialization and fall back to a fresh
compile, overwriting the entry.

No reference counterpart — torch.compile caches per-process; the reference
relies on CUDA kernels being AOT-compiled at install time.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import time
from typing import Any, Callable, Optional

import jax

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.environ.get(
    "SCENESPLAT_AOT_CACHE", os.path.expanduser("~/.cache/scenesplat_aot")
)


def _sig_of(args, kwargs):
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    parts = [str(treedef)]
    for x in leaves:
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            parts.append(f"{x.dtype}{tuple(x.shape)}")
        else:
            parts.append(repr(x))
    return "|".join(parts)


_REPO_FP = None


def repo_fingerprint() -> str:
    """Code-version component of the cache key: a stale executable from an
    edited model would otherwise load silently (keys hash shapes, not
    code). Hashes the CONTENT of every .py in the package (~10 ms once per
    process) so docs/config-only commits keep the cache warm while any
    source edit invalidates it."""
    global _REPO_FP
    if _REPO_FP is not None:
        return _REPO_FP
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, files in sorted(os.walk(pkg)):
        dirnames.sort()
        for f in sorted(files):
            if f.endswith(".py"):
                path = os.path.join(dirpath, f)
                h.update(os.path.relpath(path, pkg).encode())
                with open(path, "rb") as fh:
                    h.update(fh.read())
    # repo-root entry points define traced code too (bench.py's chains)
    root = os.path.dirname(pkg)
    for f in ("bench.py", "__graft_entry__.py"):
        path = os.path.join(root, f)
        if os.path.exists(path):
            h.update(f.encode())
            with open(path, "rb") as fh:
                h.update(fh.read())
    _REPO_FP = h.hexdigest()[:16]
    return _REPO_FP


def cache_key(name: str, args, kwargs, extra: str = "") -> str:
    # SCENESPLAT_* envs steer tracing (masked-exp, pallas dispatch, conv
    # form, ...) — two processes with different envs trace different
    # programs for identical shapes, so the env snapshot is part of the key
    env = ",".join(
        f"{k}={v}" for k, v in sorted(os.environ.items())
        if k.startswith("SCENESPLAT_")
        and k not in ("SCENESPLAT_AOT_CACHE", "SCENESPLAT_NO_AOT_CACHE")
    )
    raw = "|".join(
        [
            name,
            jax.__version__,
            jax.default_backend(),
            str(jax.device_count()),
            repo_fingerprint(),
            env,
            extra,
            _sig_of(args, kwargs),
        ]
    )
    return f"{name}-{hashlib.sha256(raw.encode()).hexdigest()[:20]}"


def compile_cached(
    fn: Callable,
    *args,
    name: str,
    extra_key: str = "",
    cache_dir: Optional[str] = None,
    donate_argnums=(),
    **kwargs,
) -> Any:
    """``jax.jit(fn).lower(*args).compile()`` with an on-disk round trip.

    Returns the loaded/compiled executable (callable with the same
    positional signature). Set ``SCENESPLAT_NO_AOT_CACHE=1`` to bypass.
    """
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    if (
        os.environ.get("SCENESPLAT_NO_AOT_CACHE") == "1"
        or jax.default_backend() == "cpu"  # XLA:CPU AOT is rejected on load
    ):
        return jitted.lower(*args, **kwargs).compile()

    cache_dir = cache_dir or _DEFAULT_DIR
    key = cache_key(name, args, kwargs, extra=extra_key)
    path = os.path.join(cache_dir, key + ".aot")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as f:
                compiled = deserialize_and_load(*pickle.load(f))
            logger.info(
                "aot_cache: loaded %s in %.2fs", key, time.perf_counter() - t0
            )
            return compiled
        except Exception as e:  # stale jax/runtime: recompile + overwrite
            logger.warning("aot_cache: stale entry %s (%s); recompiling",
                           key, e)
    t0 = time.perf_counter()
    compiled = jitted.lower(*args, **kwargs).compile()
    t_compile = time.perf_counter() - t0
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(serialize(compiled), f)
        os.replace(tmp, path)
        logger.info("aot_cache: compiled %s in %.1fs, cached %.1f MB",
                    key, t_compile, os.path.getsize(path) / 1e6)
    except Exception as e:
        logger.warning("aot_cache: could not persist %s (%s)", key, e)
    return compiled
