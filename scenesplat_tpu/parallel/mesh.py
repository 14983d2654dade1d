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


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join a multi-host run (reference: engines/launch.py:29-136 + the SLURM
    rendezvous in tools/train.py:24-60).

    On TPU pods `jax.distributed.initialize()` discovers the coordinator from
    the TPU metadata; elsewhere pass the coordinator explicitly (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). After this,
    ``jax.devices()`` spans the pod and every mesh below is global — no NCCL
    process groups, gloo side channels, or per-node subgroups.
    """
    import os

    if jax.process_count() > 1:  # already initialized
        return
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


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


def local_batch_slice(n_global: int) -> slice:
    """Rows of a [B_global, ...] batch owned by this process. The data axis
    is process-major (create_mesh lays devices out in jax.devices() order),
    so each process owns one contiguous row block — the loaders fetch only
    these rows on multi-host runs (reference DistributedSampler semantics,
    pointcept/engines/defaults.py:142-152)."""
    pc, pid = jax.process_count(), jax.process_index()
    assert n_global % pc == 0, (
        f"global batch {n_global} must divide process count {pc}"
    )
    per = n_global // pc
    return slice(pid * per, (pid + 1) * per)


def put_global(x, sharding: NamedSharding):
    """Place host data under a (possibly multi-process) sharding.

    Single-process: plain device_put. Multi-process: a cross-process
    sharding is not fully addressable, so device_put is illegal — build the
    global array from this process's LOCAL rows via
    jax.make_array_from_process_local_data (for replicated specs the local
    data IS the global value, same on every process)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [B, ...] arrays with B sharded over the mesh. On
    multi-host runs the inputs must be this process's LOCAL rows
    (local_batch_slice of the global batch)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), batch)


def context_mesh(
    n_devices: Optional[int] = None,
    data: int = 1,
    axis_names: Sequence[str] = ("data", "seq"),
) -> Mesh:
    """2-D (data, seq) mesh for context-parallel serialized attention.

    Beyond the reference (which is DP-only, SURVEY.md §2.6): the serialized
    window attention is block-diagonal over contiguous patches of the sorted
    sequence, so sharding the point axis across ``seq`` devices keeps every
    attention window device-local. Cross-shard data movement happens only in
    the order/inverse permutation gathers and pooling — GSPMD inserts the
    collectives (all-to-all style) automatically from the shardings below.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    seq = len(devices) // data
    return Mesh(np.asarray(devices[: data * seq]).reshape(data, seq), axis_names)


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """[B, N, ...] arrays: batch over 'data', points over 'seq'."""
    return NamedSharding(mesh, P("data", "seq"))


def shard_point_batch(point, mesh: Mesh):
    """Place a PointBatch with the point axis sharded over 'seq'.

    N must be divisible by the seq-axis size; with N a multiple of
    patch_size * seq_devices, every attention window stays on one device.
    """
    seq_s = sequence_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: put_global(x, seq_s)
        if getattr(x, "ndim", 0) >= 2
        else put_global(x, NamedSharding(mesh, P())),
        point,
    )
