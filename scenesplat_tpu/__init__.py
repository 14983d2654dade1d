"""SceneSplat-TPU: a TPU-native 3DGS scene-understanding framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
SceneSplat/Pointcept stack (see SURVEY.md).
"""

__version__ = "0.1.0"


def apply_platform_env():
    """Honor SCENESPLAT_PLATFORM=cpu|tpu via the config API (some hosts
    override the JAX_PLATFORMS env var at import time)."""
    import os

    platform = os.environ.get("SCENESPLAT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def setup_compilation_cache(path: str = "/tmp/scenesplat_jax_cache"):
    """Enable JAX's persistent compilation cache.

    XLA-TPU sort compiles are expensive (seconds to minutes per shape); the
    framework re-uses shapes heavily, so the on-disk cache pays for itself on
    the second run. Called by bench.py / tools entry points.

    Also honors SCENESPLAT_PLATFORM so every entry point that sets up the
    cache (probes included) can be forced onto CPU for smoke runs.
    """
    import jax

    apply_platform_env()
    # XLA:CPU AOT cache entries are rejected at every load on this toolchain
    # (cpu_aot_loader refuses the +prefer-no-scatter/+prefer-no-gather
    # pseudo-features even same-host), so on CPU the cache never hits — skip
    # it to avoid serialization cost + E-line spam. TPU entries load fine.
    import os

    if os.environ.get("SCENESPLAT_PLATFORM", "").lower() == "cpu":
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
