"""Environment helpers: seeding and device info (reference: pointcept/utils/env.py:19)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int | None = None) -> int:
    """Seed python/numpy; JAX randomness is explicit via PRNG keys derived
    from this seed by callers."""
    if seed is None:
        seed = int.from_bytes(os.urandom(4), "little")
    random.seed(seed)
    np.random.seed(seed % (2**32))
    from scenesplat_tpu.data.transforms import seed_transforms

    seed_transforms(seed)  # calling thread's transform RNG (ad-hoc scripts)
    return seed
