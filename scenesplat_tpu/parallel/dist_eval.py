"""Multi-host evaluation sharding.

The reference shards test scenes across ranks with a DistributedSampler-style
round-robin and merges results with torch.distributed — per-scene record
gather in the testers (pointcept/engines/test.py:88-106, 549-666) and a
confusion-matrix allreduce in the zero-shot eval hook
(pointcept/engines/hooks/evaluator.py:845-851). Here the same protocol is
process-based: each JAX process evaluates global scene indices
``rank::world`` and the numpy metric accumulators are summed across
processes with a host allgather, so every host ends with identical metrics
(the checkpoint-metric broadcast the reference needs falls out for free).

Scene-fetch RNG stays keyed on the GLOBAL scene index, so metrics are
bit-identical for any world size.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np


def eval_rank() -> int:
    """This process's eval shard id. ``SCENESPLAT_EVAL_RANK`` overrides for
    single-process tests of the partition protocol."""
    v = os.environ.get("SCENESPLAT_EVAL_RANK")
    return int(v) if v is not None else jax.process_index()


def eval_world() -> int:
    v = os.environ.get("SCENESPLAT_EVAL_WORLD")
    return int(v) if v is not None else jax.process_count()


def partition_indices(n: int, rank: Optional[int] = None,
                      world: Optional[int] = None) -> List[int]:
    """Round-robin shard of ``range(n)``: indices ``rank, rank+world, ...``
    (the reference's non-shuffled DistributedSampler assignment)."""
    rank = eval_rank() if rank is None else rank
    world = eval_world() if world is None else world
    return list(range(rank, n, world))


def allgather_pyobjects(objs: list) -> list:
    """Concatenate per-process lists of picklable records in rank order
    (reference test.py:549-666 / evaluator.py: comm.gather of per-scene
    records). Single-process: identity. Ragged payloads are pickled,
    zero-padded to the max length, and allgathered as uint8 arrays."""
    if jax.process_count() == 1:
        return list(objs)
    import pickle

    from jax.experimental import multihost_utils

    # int32 explicitly: with jax_enable_x64 off, process_allgather would
    # silently downcast int64 anyway; payload sizes always fit.
    payload = np.frombuffer(pickle.dumps(list(objs)), np.uint8)
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int32)
    ).reshape(-1)
    buf = np.zeros(int(lengths.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for rank, ln in enumerate(lengths):
        out.extend(pickle.loads(gathered[rank, : int(ln)].tobytes()))
    return out


def allreduce_sum_arrays(tree):
    """Element-wise sum of a pytree of numpy arrays/scalars across all JAX
    processes; identity when single-process. Every host returns the same
    summed values (reference evaluator.py:845-851 dist.all_reduce)."""
    if jax.process_count() == 1:
        return tree
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    # Gather through the pickled path: lossless for every dtype (a
    # device-array allgather would downcast int64/float64 accumulators with
    # jax_enable_x64 off, losing exactness above 2^24 counts), and the
    # rank-ordered summation makes every host compute bit-identical sums.
    per_rank = allgather_pyobjects([[np.asarray(leaf) for leaf in leaves]])
    summed = list(per_rank[0])
    for rank_leaves in per_rank[1:]:
        summed = [a + b for a, b in zip(summed, rank_leaves)]
    return jax.tree_util.tree_unflatten(treedef, summed)
