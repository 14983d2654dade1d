"""Test configuration: force an 8-device CPU platform before any backend
initialization so multi-chip sharding paths can be exercised without TPU
hardware. Note: this machine presets JAX_PLATFORMS=axon and overrides the env
var at import time, so the config API (which wins) is used instead."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
# XLA:CPU terminates collectives stuck >40 s by default; on a 1-core sandbox
# an 8-device psum under a slow compile can trip that (rendezvous.cc:127).
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags = (
        flags
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the (always-CPU) test suite: XLA:CPU AOT
# entries are rejected at every load on this toolchain — cpu_aot_loader
# refuses the +prefer-no-scatter/+prefer-no-gather pseudo-features even for
# entries compiled by THIS host — so the cache never produces a hit, only
# serialization cost and E-line spam. (Verified by a two-run probe; the TPU
# side still uses /tmp/scenesplat_jax_cache via setup_compilation_cache.)

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


_REF_STUBS = (
    "torch_scatter", "spconv", "spconv.pytorch", "flash_attn",
    "pointops", "pointops2", "pointgroup_ops",
    "torch_geometric", "torch_geometric.nn", "torch_geometric.nn.pool",
    "torch_geometric.utils", "ocnn",
    "timm", "timm.layers", "timm.models", "timm.models.layers",
    "plyfile", "open3d", "SharedArray", "numba",
    "yapf", "yapf.yapflib", "yapf.yapflib.yapf_api", "tensorboardX",
    "sharedarray", "wandb", "einops", "easydict",
)


def _make_ref_stub(name, attrs=None):
    import types

    m = types.ModuleType(name)
    m.__path__ = []
    cache = {}

    def ga(attr, _n=name):
        if attr.startswith("__"):
            raise AttributeError(attr)
        if attr not in cache:
            cache[attr] = type(
                attr, (object,), {"__init__": lambda self, *a, **k: None}
            )
        return cache[attr]

    m.__getattr__ = ga
    for k, v in (attrs or {}).items():
        setattr(m, k, v)
    return m


def load_reference_package(dotted: str):
    """Import a module from the reference repo as part of its real package,
    stubbing the CUDA-only third-party deps its package __init__s pull in.
    Returns None when unavailable. Use only for pure-torch/numpy reference
    code (losses, transforms, schedulers) — the stubs are inert."""
    import importlib
    import sys
    import types

    if not os.path.isdir(REFERENCE_ROOT):
        return None
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    class _AddictDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

    def _njit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    def _really_installed(name):
        import importlib.util

        try:
            return importlib.util.find_spec(name) is not None
        except (ImportError, ModuleNotFoundError, ValueError):
            return False

    # only stub modules that are genuinely absent — a stub must never
    # shadow a real installed package for the rest of the process
    needed = [n for n in _REF_STUBS
              if n not in sys.modules and not _really_installed(n)]
    for name in needed:
        sys.modules.setdefault(name, _make_ref_stub(name))
    for name in needed:
        if "." in name:
            parent, child = name.rsplit(".", 1)
            if parent in sys.modules and child not in dir(sys.modules[parent]):
                setattr(sys.modules[parent], child, sys.modules[name])
    nb = sys.modules["numba"]
    nb.njit = _njit
    nb.jit = _njit
    nb.prange = range
    sys.modules.setdefault(
        "addict", _make_ref_stub("addict", {"Dict": _AddictDict})
    )
    try:
        return importlib.import_module(dotted)
    except Exception:
        return None


_SLOW_MODULES = {
    # compile-heavy: whole-model forwards/grads or full training cycles.
    # Quick tier: `python -m pytest tests/ -m "not slow" -q` (~minutes);
    # full suite stays `python -m pytest tests/ -x -q`.
    "tests.test_engine", "tests.test_train_step", "tests.test_model",
    "tests.test_ssl", "tests.test_msc", "tests.test_geometry_split",
    "tests.test_context_parallel", "tests.test_full_model_golden",
    "tests.test_spunet_golden", "tests.test_ptv1_golden",
    "tests.test_ptv2_golden", "tests.test_oacnns_golden", "tests.test_spvcnn_golden",
    "tests.test_mink_golden", "tests.test_cac_golden",
    "tests.test_pdnorm_golden", "tests.test_ppt_golden",
    "tests.test_pointgroup_golden",
    "tests.test_spunet", "tests.test_mink_unet", "tests.test_octformer",
    "tests.test_stratified", "tests.test_spvcnn", "tests.test_oacnns",
    "tests.test_ptv1", "tests.test_ptv2", "tests.test_cac",
    "tests.test_ppt", "tests.test_point_group", "tests.test_ckpt_bridge",
    # 189 s: an 8-device (4,2)-mesh train-step grad comparison
    "tests.test_tensor_parallel",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy whole-model / training-cycle tests"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item.module, "__name__", "")
        if mod in _SLOW_MODULES or mod.split(".")[-1] in {
            m.split(".")[-1] for m in _SLOW_MODULES
        }:
            item.add_marker(pytest.mark.slow)


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
