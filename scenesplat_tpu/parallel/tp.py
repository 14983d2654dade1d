"""Tensor (model) parallelism for the serialized-transformer backbones.

Beyond the reference (which is data-parallel only — SURVEY.md §2.6,
pointcept/engines/launch.py): Megatron-style sharding of the per-block
weight matrices over a ``model`` mesh axis, expressed purely as GSPMD
sharding annotations — no manual collectives, no code changes in the
model. XLA partitions the four big matmuls per Block and inserts the
reduce (psum) after each row-sharded contraction over ICI:

- ``attn/qkv``   kernel [C, 3C]      -> column-sharded  P(None, "model")
- ``attn/proj``  kernel [C, C]       -> row-sharded     P("model", None)
- ``mlp/fc1``    kernel [C, 4C]      -> column-sharded  P(None, "model")
- ``mlp/fc2``    kernel [4C, C]      -> row-sharded     P("model", None)

Column-sharded layers also shard their bias; row-sharded layers keep the
bias replicated (it is added once, after the cross-shard reduction).
Everything else (norms, CPE convs, pooling projections, heads) is
replicated — those are a small fraction of parameters and FLOPs.

Composes with data parallelism (batch over ``data``) and context
parallelism (point axis over ``seq``, parallel/mesh.py:context_mesh) on a
2-D/3-D mesh. Because the annotations only constrain the WEIGHTS, GSPMD
is free to keep activations in whatever layout minimizes resharding —
e.g. the head-interleaved qkv reshape is handled by the partitioner, not
by hand.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (matched trailing path, kernel spec, bias spec)
_COL = ("qkv", "fc1")   # column-parallel: output features sharded
_ROW = ("fc2",)         # row-parallel: input features sharded


def _path_keys(path) -> tuple:
    keys = []
    for p in path:
        keys.append(getattr(p, "key", getattr(p, "name", str(p))))
    return tuple(str(k) for k in keys)


def tp_spec_for_path(path, leaf, axis: str = "model") -> P:
    """PartitionSpec for one param leaf under tensor parallelism."""
    keys = _path_keys(path)
    if len(keys) < 2 or getattr(leaf, "ndim", 0) == 0:
        return P()
    mod, name = keys[-2], keys[-1]
    if mod in _COL:
        if name == "kernel":
            return P(None, axis)
        if name == "bias":
            return P(axis)
    if mod in _ROW and name == "kernel":
        return P(axis, None)
    # attention output projection only — pooling/unpooling layers are also
    # named "proj" but their inputs are replicated
    if mod == "proj" and name == "kernel" and len(keys) >= 3 and keys[-3] == "attn":
        return P(axis, None)
    return P()


def tp_shardings(params, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings mirroring ``params`` (rule: tp_spec_for_path)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec_for_path(path, leaf, axis)),
        params,
    )


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put the param tree with tensor-parallel shardings.

    Optimizer states derived from these params (``optax`` init uses
    ``zeros_like``-style constructors) inherit the same shardings, so the
    AdamW moments are sharded for free.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, tp_spec_for_path(path, leaf, axis))
        ),
        params,
    )


def tp_mesh(
    n_devices: Optional[int] = None,
    model: int = 2,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """2-D (data, model) mesh: batch over 'data', weights over 'model'.

    On real hardware put 'model' on the minor (fastest-ICI) axis — the
    per-block psums ride it every layer, while the 'data' gradient
    allreduce fires once per step.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    data = len(devices) // model
    return Mesh(
        np.asarray(devices[: data * model]).reshape(data, model), axis_names
    )
