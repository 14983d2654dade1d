"""Tensor (model) parallelism on a virtual mesh.

Beyond the reference (DP only): Megatron-style weight sharding of the
qkv/proj/fc1/fc2 matmuls over a 'model' mesh axis (parallel/tp.py),
composed with data parallelism over 'data'. Correctness bar: loss and
gradients match the single-device run — GSPMD must insert the right
psums after each row-sharded contraction, in forward AND backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.parallel.tp import (
    shard_params_tp,
    tp_mesh,
    tp_spec_for_path,
)
from jax.sharding import NamedSharding, PartitionSpec as P


def _tiny_model():
    return build_model(dict(
        type="PT-v3m1", in_channels=6,
        order=("z", "hilbert"), stride=(2,),
        enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(2, 2),
        enc_patch_size=(16, 16),
        dec_depths=(1,), dec_channels=(8,), dec_num_head=(2,),
        dec_patch_size=(16,),
        mlp_ratio=2, drop_path=0.0, serialization_depth=10,
        use_pallas=False,
    ))


def _inputs(b=4, n=128):
    rng = np.random.default_rng(0)
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    return PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), grid_size=0.05
    )


def test_tp_spec_rule():
    """The path rule shards exactly the four per-block matmul families."""
    model = _tiny_model()
    point = _inputs(b=1, n=64)
    variables = model.init(jax.random.PRNGKey(0), point)

    specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: tp_spec_for_path(path, leaf), variables["params"]
    )
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {}
    for path, spec in flat:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        by_name.setdefault((keys[-2], keys[-1]), set()).add(spec)

    assert by_name[("qkv", "kernel")] == {P(None, "model")}
    assert by_name[("qkv", "bias")] == {P("model")}
    assert by_name[("fc1", "kernel")] == {P(None, "model")}
    assert by_name[("fc1", "bias")] == {P("model")}
    assert by_name[("fc2", "kernel")] == {P("model", None)}
    assert by_name[("fc2", "bias")] == {P()}
    # attention proj is row-sharded; pooling/unpooling proj stays replicated
    proj_specs = set()
    for path, spec in flat:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        if keys[-2] == "proj" and keys[-1] == "kernel":
            proj_specs.add((("attn" in keys), spec))
    assert (True, P("model", None)) in proj_specs
    assert all(spec == P() for is_attn, spec in proj_specs if not is_attn)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs >= 8 devices")
def test_tp_forward_and_grads_match():
    model = _tiny_model()
    point = _inputs()
    variables = model.init(jax.random.PRNGKey(0), point)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, pt):
        out = model.apply({"params": p, **extra}, pt, train=False)
        return jnp.mean(jnp.where(out.mask[..., None], out.feat, 0.0) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, point)
    ref_loss = float(ref_loss)

    mesh = tp_mesh(8, model=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}
    with mesh:
        tp_params = shard_params_tp(params, mesh)
        # weights must actually be sharded, not replicated
        qkv_kernel = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map_with_path(
                lambda path, leaf: leaf
                if tuple(str(getattr(p, "key", p)) for p in path)[-2:]
                == ("qkv", "kernel") else None,
                tp_params,
                is_leaf=lambda x: x is None,
            )
        )[0]
        shard = qkv_kernel.addressable_shards[0]
        assert shard.data.shape[1] == qkv_kernel.shape[1] // 2

        batch_s = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        pt = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, batch_s if getattr(x, "ndim", 0) >= 1 else repl
            ),
            point,
        )
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(tp_params, pt)
        loss = float(loss)
        got = jax.device_get(grads)

    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
    ref_flat = jax.tree_util.tree_leaves(ref_grads)
    got_flat = jax.tree_util.tree_leaves(got)
    assert len(ref_flat) == len(got_flat)
    for r, g in zip(ref_flat, got_flat):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-5
        )
