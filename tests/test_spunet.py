"""Sparse strided/inverse convs vs numpy; SpUNet forward/cls/grads."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.ops.segops import build_pooling_plan, pool_values
from scenesplat_tpu.ops.serialization import serialize, take_along_points
from scenesplat_tpu.ops.sparse_conv import (
    inverse_conv_apply,
    kernel_tap,
    strided_conv_apply,
)


def _voxels(rng, b=2, n=64, n_valid=(64, 40), extent=8):
    # unique voxels per scene
    gc = np.zeros((b, n, 3), np.int32)
    mask = np.zeros((b, n), bool)
    for i, v in enumerate(n_valid):
        seen = set()
        while len(seen) < v:
            seen.add(tuple(rng.integers(0, extent, 3).tolist()))
        gc[i, :v] = np.array(sorted(seen))
        mask[i, :v] = True
    return jnp.asarray(gc), jnp.asarray(mask)


def test_strided_and_inverse_conv_vs_numpy():
    rng = np.random.default_rng(0)
    gc, mask = _voxels(rng)
    b, n = mask.shape
    cin, cout = 5, 7
    feat = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))

    ser = serialize(gc, mask, orders=("z",), depth=10)
    m_cap = 48
    plan = build_pooling_plan(ser, mask, m_cap, pooling_depth=1)
    out = strided_conv_apply(feat, plan, gc, kernel)
    parent_gc = np.asarray(take_along_points(gc, plan.head_index)) >> 1

    gc_n, mask_n, feat_n, k_n = map(np.asarray, (gc, mask, feat, kernel))
    out_n = np.asarray(out)
    for i in range(b):
        parents = {}
        for j in np.where(mask_n[i])[0]:
            p = tuple((gc_n[i, j] >> 1).tolist())
            tap = ((gc_n[i, j, 0] & 1) << 2) | ((gc_n[i, j, 1] & 1) << 1) | (
                gc_n[i, j, 2] & 1
            )
            parents.setdefault(p, np.zeros(cout, np.float32))
            parents[p] += feat_n[i, j] @ k_n[tap]
        n_out = int(np.asarray(plan.n_clusters)[i])
        assert n_out == len(parents)
        for c in range(n_out):
            key = tuple(parent_gc[i, c].tolist())
            np.testing.assert_allclose(out_n[i, c], parents[key], rtol=1e-4,
                                       atol=1e-4)

    # inverse: each child gets kernel[tap(child)] @ parent_feat
    pf = jnp.asarray(rng.normal(size=(b, m_cap, cout)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(size=(8, cout, cin)).astype(np.float32))
    rec = inverse_conv_apply(pf, plan, gc, k2, mask=mask)
    rec_n, pf_n, k2_n = map(np.asarray, (rec, pf, k2))
    cl = np.asarray(plan.cluster_of_point)
    taps = np.asarray(kernel_tap(gc))
    for i in range(b):
        for j in np.where(mask_n[i])[0][:20]:
            expect = pf_n[i, cl[i, j]] @ k2_n[taps[i, j]]
            np.testing.assert_allclose(rec_n[i, j], expect, rtol=1e-4, atol=1e-4)
    assert (rec_n[~mask_n] == 0).all()


def _tiny_spunet(**kw):
    cfg = dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=5,
        base_channels=8,
        channels=(8, 16, 16, 8),
        layers=(1, 1, 1, 1),
        serialization_depth=10,
        stage_capacity=(1.0, 1.0),
    )
    cfg.update(kw)
    return build_model(cfg)


def _batch(rng, b=2, n=128, n_valid=(128, 80)):
    coord = rng.uniform(0, 2, size=(b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i, v in enumerate(n_valid):
        mask[i, :v] = True
    return PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )


def test_spunet_forward_and_cls():
    model = _tiny_spunet()
    point = _batch(np.random.default_rng(1))
    params = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(params, point)
    assert out.feat.shape == (2, 128, 5)
    assert bool(jnp.isfinite(out.feat[out.mask]).all())

    cls = _tiny_spunet(cls_mode=True, num_classes=0)
    params = cls.init(jax.random.PRNGKey(0), point)
    pooled = cls.apply(params, point)
    assert pooled.shape[0] == 2 and pooled.ndim == 2

    noskip = _tiny_spunet(type="SpUNetNoSkipBase")
    params = noskip.init(jax.random.PRNGKey(0), point)
    out = noskip.apply(params, point)
    assert out.feat.shape == (2, 128, 5)


def test_spunet_grads_finite():
    model = _tiny_spunet(type="SpUNet-v1m2")
    point = _batch(np.random.default_rng(2), n_valid=(128, 128))
    variables = model.init(jax.random.PRNGKey(0), point, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            point, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out.feat**2)

    grads = jax.grad(loss_fn)(variables["params"])
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads))
