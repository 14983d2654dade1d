"""Test configuration: force an 8-device CPU platform before JAX import so
multi-chip sharding paths can be exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
