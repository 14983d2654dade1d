"""Test configuration: force an 8-device CPU platform before any backend
initialization so multi-chip sharding paths can be exercised without TPU
hardware. Note: this machine presets JAX_PLATFORMS=axon and overrides the env
var at import time, so the config API (which wins) is used instead."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/scenesplat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def load_reference_module(relpath: str, name: str):
    """Import a single file from the read-only reference repo (for golden
    comparisons only). Returns None when unavailable."""
    import importlib.util

    path = os.path.join(REFERENCE_ROOT, relpath)
    if not os.path.isfile(path):
        return None
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        return None
    return mod


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the forced-CPU platform, got "
        f"{jax.default_backend()}"
    )
    assert jax.device_count() >= 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
