"""Strided/inverse sparse conv goldens vs REAL spconv semantics.

tests/ref_exec_stubs.py implements spconv.SparseConv3d /
SparseInverseConv3d semantics (pair enumeration: out j exists iff some
input i = j*stride + offset; inverse replays the cached pairs with roles
swapped — the SpUNet indice_key contract,
spconv_unet_v1m1_base.py:136-183). This compares ops/sparse_conv.py
against that semantics POSITION-KEYED (spconv's output row order is
hash-iteration-defined, ours is serialized-code order — features per voxel
must still agree exactly)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

from scenesplat_tpu.ops.segops import build_pooling_plan  # noqa: E402
from scenesplat_tpu.ops.serialization import (  # noqa: E402
    serialize,
    take_along_points,
)
from scenesplat_tpu.ops.sparse_conv import (  # noqa: E402
    inverse_conv_apply,
    strided_conv_apply,
)
from tests.ref_exec_stubs import (  # noqa: E402
    SparseConv3d,
    SparseConvTensor,
    SparseInverseConv3d,
)


def _scene(rng, n=120, extent=16):
    seen = set()
    while len(seen) < n:
        seen.add(tuple(rng.integers(0, extent, 3).tolist()))
    gc = np.array(sorted(seen), np.int32)
    gc = gc[rng.permutation(n)]
    return gc


def test_strided_then_inverse_matches_spconv_semantics():
    rng = np.random.default_rng(1)
    n, cin, cmid, cout = 120, 5, 7, 4
    gc = _scene(rng, n)
    feat = rng.normal(size=(n, cin)).astype(np.float32)
    k_down = rng.normal(size=(8, cin, cmid)).astype(np.float32)
    k_up = rng.normal(size=(8, cmid, cout)).astype(np.float32)

    # ---- reference-semantics side (executable spconv stand-in) ----
    conv = SparseConv3d(cin, cmid, kernel_size=2, stride=2, bias=False,
                        indice_key="s1")
    inv = SparseInverseConv3d(cmid, cout, kernel_size=2, bias=False,
                              indice_key="s1")
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k_down).view(2, 2, 2, cin, cmid))
        inv.weight.copy_(torch.from_numpy(k_up).view(2, 2, 2, cmid, cout))
        idx = np.concatenate([np.zeros((n, 1), np.int32), gc], 1)
        x = SparseConvTensor(torch.from_numpy(feat), torch.from_numpy(idx),
                             [20, 20, 20], 1)
        y_ref = conv(x)
        z_ref = inv(y_ref)
    ref_down = {
        tuple(c): v for c, v in
        zip(y_ref.indices.numpy()[:, 1:], y_ref.features.numpy())
    }
    ref_up = {
        tuple(c): v for c, v in
        zip(z_ref.indices.numpy()[:, 1:], z_ref.features.numpy())
    }

    # ---- our side ----
    gcj = jnp.asarray(gc)[None]
    mask = jnp.ones((1, n), bool)
    ser = serialize(gcj, mask, orders=("z",), depth=10)
    plan = build_pooling_plan(ser, mask, out_capacity=n, pooling_depth=1)
    down = np.asarray(
        strided_conv_apply(jnp.asarray(feat)[None], plan, gcj,
                           jnp.asarray(k_down))
    )[0]
    parent_gc = np.asarray(take_along_points(gcj, plan.head_index))[0] >> 1
    out_mask = np.asarray(plan.out_mask)[0]

    assert out_mask.sum() == len(ref_down)
    for c, v, ok in zip(parent_gc, down, out_mask):
        if ok:
            np.testing.assert_allclose(
                v, ref_down[tuple(c)], rtol=1e-5, atol=1e-5,
                err_msg=f"downsample mismatch at parent voxel {c}",
            )

    # feed OUR pooled features through OUR inverse conv; child-keyed compare
    up = np.asarray(
        inverse_conv_apply(jnp.asarray(down)[None], plan, gcj,
                           jnp.asarray(k_up), mask=mask)
    )[0]
    assert len(ref_up) == n
    for c, v in zip(gc, up):
        np.testing.assert_allclose(
            v, ref_up[tuple(c)], rtol=1e-5, atol=1e-5,
            err_msg=f"inverse mismatch at voxel {c}",
        )


def test_deconv_k3s2_matches_naive_spec():
    """Corner-anchored k3s2 transposed conv (ocnn OctreeDeconv semantics,
    tests/ocnn_stub.py docstring) vs a naive per-child/per-offset loop:
    out[c] = sum over delta in (-1..1)^3 with c - delta even per axis and
    (c - delta)/2 an existing parent of x[parent] @ W[delta]."""
    import itertools

    from scenesplat_tpu.ops.sparse_conv import (
        build_corner_lookup,
        deconv_k3s2_apply,
    )

    rng = np.random.default_rng(7)
    n, cin, cout = 140, 6, 5
    gc = _scene(rng, n)
    parents = np.unique(gc >> 1, axis=0)
    m = len(parents)
    pfeat = rng.normal(size=(m, cin)).astype(np.float32)
    kernel = rng.normal(size=(27, cin, cout)).astype(np.float32)

    parent_row = {tuple(p): i for i, p in enumerate(parents)}
    want = np.zeros((n, cout), np.float32)
    for ci, c in enumerate(gc):
        for t, delta in enumerate(itertools.product((-1, 0, 1), repeat=3)):
            q = c - np.asarray(delta)
            if np.any(q & 1) or tuple(q >> 1) not in parent_row:
                continue
            want[ci] += pfeat[parent_row[tuple(q >> 1)]] @ kernel[t]

    ser = serialize(jnp.asarray(parents)[None], jnp.ones((1, m), bool),
                    ("z",), depth=16)
    idx, found = build_corner_lookup(
        (ser.code_hi[0], ser.code_lo[0], ser.order[0]),
        jnp.asarray(gc)[None], jnp.ones((1, n), bool), depth=16,
    )
    got = np.asarray(deconv_k3s2_apply(
        jnp.asarray(pfeat)[None], idx, found, jnp.asarray(gc)[None],
        jnp.asarray(kernel),
    ))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
