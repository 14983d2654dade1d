"""Context-parallel (sequence-sharded) forward on a virtual mesh.

Beyond the reference (DP only): shard the point axis over a 'seq' mesh axis
and verify the flagship forward compiles under GSPMD and matches the
single-device result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.parallel.mesh import context_mesh, shard_point_batch


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_sequence_parallel_forward_matches():
    model = build_model(dict(
        type="PT-v3m1", in_channels=6,
        order=("z", "hilbert"), stride=(2,),
        enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(2, 2),
        enc_patch_size=(16, 16),
        dec_depths=(1,), dec_channels=(8,), dec_num_head=(2,),
        dec_patch_size=(16,),
        mlp_ratio=2, drop_path=0.0, serialization_depth=10,
        use_pallas=False,
    ))
    rng = np.random.default_rng(0)
    b, n = 2, 128  # n divisible by patch * seq_devices (16 * 4)
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), grid_size=0.05
    )
    variables = model.init(jax.random.PRNGKey(0), point)
    ref = np.asarray(model.apply(variables, point).feat)

    mesh = context_mesh(4, data=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "seq": 2}
    with mesh:
        sharded = shard_point_batch(point, mesh)
        fwd = jax.jit(lambda v, p: model.apply(v, p, train=False).feat)
        out = fwd(variables, sharded)
        got = np.asarray(out)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_sequence_parallel_backward_matches():
    """Training under sequence sharding: gradients computed on a (data=2,
    seq=2) mesh must match the single-device gradients — proves GSPMD
    inserts correct collectives through the permutation gathers, pooling
    scatter-adds, and window attention in the BACKWARD pass too."""
    model = build_model(dict(
        type="PT-v3m1", in_channels=6,
        order=("z", "hilbert"), stride=(2,),
        enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(2, 2),
        enc_patch_size=(16, 16),
        dec_depths=(1,), dec_channels=(8,), dec_num_head=(2,),
        dec_patch_size=(16,),
        mlp_ratio=2, drop_path=0.0, serialization_depth=10,
        use_pallas=False,
    ))
    rng = np.random.default_rng(3)
    b, n = 2, 128
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    target = rng.normal(size=(b, n, 8)).astype(np.float32)
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), grid_size=0.05
    )
    variables = model.init(jax.random.PRNGKey(0), point)

    def loss_fn(params, p, tgt):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            p, train=False,
        )
        d = (out.feat - tgt) * out.mask[..., None]
        return jnp.sum(d.astype(jnp.float32) ** 2)

    ref_grads = jax.grad(loss_fn)(
        variables["params"], point, jnp.asarray(target)
    )

    from scenesplat_tpu.parallel.mesh import sequence_sharding

    mesh = context_mesh(4, data=2)
    with mesh:
        sharded_p = shard_point_batch(point, mesh)
        sharded_t = jax.device_put(
            jnp.asarray(target), sequence_sharding(mesh)
        )
        grad_fn = jax.jit(jax.grad(loss_fn))
        got_grads = grad_fn(variables["params"], sharded_p, sharded_t)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_got = {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(got_grads)
    }
    for k, v_ref in flat_ref:
        key = jax.tree_util.keystr(k)
        v_ref = np.asarray(v_ref)
        scale = max(np.abs(v_ref).max(), 1e-3)
        np.testing.assert_allclose(
            flat_got[key] / scale, v_ref / scale, rtol=5e-4, atol=5e-5,
            err_msg=f"seq-parallel grad mismatch at {key}",
        )
