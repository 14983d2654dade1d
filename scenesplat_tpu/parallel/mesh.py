"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP distribution
(pointcept/engines/launch.py:29-136, engines/defaults.py:13-34, utils/comm.py):
a single-controller data-parallel mesh. Gradient allreduce, metric reductions
and sync-BN statistics all fall out of pjit's global-array semantics — XLA
inserts psums over ICI where the reference called NCCL collectives explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """1-D data mesh by default; reshape-able to (data, model) later."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
