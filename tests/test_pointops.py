"""pointops (kNN/ball query/FPS/grouping/interpolation) vs numpy brute force.

Mirrors the reference's kernel-correctness-script pattern
(libs/pointops2/functions/test_*.py) with assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenesplat_tpu.ops import pointops as po


def _cloud(rng, b=2, n=200, n_valid=(200, 150)):
    coord = rng.uniform(0, 4, size=(b, n, 3)).astype(np.float32)
    mask = np.zeros((b, n), bool)
    for i, v in enumerate(n_valid):
        mask[i, :v] = True
    coord[~mask] = 77.0  # garbage in padding
    return jnp.asarray(coord), jnp.asarray(mask)


def _np_knn(coord, mask, k, query=None, qmask=None):
    query = coord if query is None else query
    qmask = mask if qmask is None else qmask
    b, m = query.shape[:2]
    idx = np.full((b, m, k), -1, np.int32)
    dist = np.full((b, m, k), np.inf, np.float32)
    for i in range(b):
        valid = np.where(mask[i])[0]
        for j in range(m):
            if not qmask[i, j]:
                continue
            d = np.linalg.norm(coord[i, valid] - query[i, j], axis=-1)
            kk = min(k, len(valid))
            sel = np.argsort(d, kind="stable")[:kk]
            idx[i, j, :kk] = valid[sel]
            dist[i, j, :kk] = d[sel]
    return idx, dist


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    coord, mask = _cloud(rng)
    idx, dist = jax.jit(lambda c, m: po.knn(c, m, 8, tile=64))(coord, mask)
    ridx, rdist = _np_knn(np.asarray(coord), np.asarray(mask), 8)
    # distances must match exactly up to fp tolerance; ties may permute idx
    np.testing.assert_allclose(
        np.asarray(dist)[np.asarray(mask)], rdist[np.asarray(mask)], rtol=2e-3, atol=2e-3
    )
    # each selected neighbor must be a valid point
    m = np.asarray(mask)
    sel = np.asarray(idx)[m]
    assert (sel >= 0).all()
    for i in range(coord.shape[0]):
        assert set(np.asarray(idx)[i][m[i]].ravel()) <= set(np.where(m[i])[0])


def test_knn_separate_queries_and_invalid_rows():
    rng = np.random.default_rng(1)
    coord, mask = _cloud(rng)
    query = jnp.asarray(rng.uniform(0, 4, size=(2, 33, 3)).astype(np.float32))
    qmask = jnp.asarray(np.arange(33)[None, :].repeat(2, 0) < np.array([[33], [10]]))
    idx, dist = po.knn(coord, mask, 4, query=query, query_mask=qmask)
    assert (np.asarray(idx)[1, 10:] == -1).all()
    ridx, rdist = _np_knn(
        np.asarray(coord), np.asarray(mask), 4, np.asarray(query), np.asarray(qmask)
    )
    np.testing.assert_allclose(
        np.asarray(dist)[np.asarray(qmask)], rdist[np.asarray(qmask)], rtol=2e-3, atol=2e-3
    )


def test_ball_query_band_and_order():
    rng = np.random.default_rng(2)
    coord, mask = _cloud(rng)
    nsample, rmax, rmin = 6, 0.8, 0.2
    idx, d2 = po.ball_query(coord, mask, nsample, rmax, min_radius=rmin, tile=64)
    idx_n, d2_n = np.asarray(idx), np.asarray(d2)
    c, m = np.asarray(coord), np.asarray(mask)
    for i in range(2):
        for j in np.where(m[i])[0][:40]:
            d = np.sum((c[i] - c[i, j]) ** 2, axis=-1)
            band = np.where((d >= rmin**2) & (d <= rmax**2) & m[i])[0]
            expect = band[:nsample]
            got = idx_n[i, j][: len(expect)]
            assert set(got) == set(expect), (i, j)
            if len(band) == 0:
                assert (idx_n[i, j] == -1).all()
            elif len(band) < nsample:
                # unfound slots repeat the first found neighbor
                assert (idx_n[i, j][len(band):] == idx_n[i, j, 0]).all()


def test_random_ball_query_in_band():
    rng = np.random.default_rng(3)
    coord, mask = _cloud(rng)
    idx, d2 = po.random_ball_query(
        jax.random.PRNGKey(0), coord, mask, 5, 1.0, min_radius=0.1, tile=64
    )
    ok = np.asarray(idx) >= 0
    d2 = np.asarray(d2)
    assert ((d2[ok] >= 0.1**2 - 1e-5) & (d2[ok] <= 1.0 + 1e-5)).all()


def test_fps_greedy_and_masked():
    rng = np.random.default_rng(4)
    coord, mask = _cloud(rng, n_valid=(200, 20))
    m_samples = 30
    idx, smask = jax.jit(lambda c, m: po.farthest_point_sampling(c, m, m_samples))(
        coord, mask
    )
    idx_n, smask_n = np.asarray(idx), np.asarray(smask)
    c, m = np.asarray(coord), np.asarray(mask)
    # scene 1 has 20 valid points -> only 20 valid samples
    assert smask_n[0].all() and smask_n[1].sum() == 20
    for i in range(2):
        sel = idx_n[i][smask_n[i]]
        assert len(set(sel.tolist())) == len(sel)  # no duplicates
        assert m[i][sel].all()
        # greedy check: sample t is the argmax of min-dist to previous samples
        for t in range(1, int(smask_n[i].sum())):
            prev = c[i, sel[:t]]
            dmin = np.min(
                np.linalg.norm(c[i, m[i]][:, None] - prev[None], axis=-1), axis=1
            )
            assert np.isclose(
                dmin.max(),
                np.min(np.linalg.norm(c[i, sel[t]] - prev, axis=-1)),
                rtol=1e-4,
            )


def test_grouping_with_xyz_and_invalid():
    rng = np.random.default_rng(5)
    coord, mask = _cloud(rng)
    feat = jnp.asarray(rng.normal(size=(2, 200, 7)).astype(np.float32))
    idx, _ = po.knn(coord, mask, 4)
    idx = idx.at[:, :, -1].set(-1)  # force an invalid slot
    g = po.grouping(idx, feat, coord, with_xyz=True)
    assert g.shape == (2, 200, 4, 10)
    gn, fn, cn, idn = map(np.asarray, (g, feat, coord, idx))
    i, j = 0, 5
    for k in range(3):
        np.testing.assert_allclose(gn[i, j, k, 3:], fn[i, idn[i, j, k]], rtol=1e-6)
        np.testing.assert_allclose(
            gn[i, j, k, :3], cn[i, idn[i, j, k]] - cn[i, j], rtol=1e-4, atol=1e-5
        )
    assert (gn[:, :, -1, :] == 0).all()


def test_interpolation_idw():
    rng = np.random.default_rng(6)
    src, smask = _cloud(rng, n=64, n_valid=(64, 40))
    dst, dmask = _cloud(rng, n=100, n_valid=(100, 70))
    feat = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))
    out = po.interpolation(src, smask, dst, dmask, feat, k=3)
    assert out.shape == (2, 100, 5)
    idx, dist = _np_knn(np.asarray(src), np.asarray(smask), 3, np.asarray(dst), np.asarray(dmask))
    i, j = 1, 11
    w = 1.0 / (dist[i, j] + 1e-8)
    w = w / w.sum()
    expect = (np.asarray(feat)[i, idx[i, j]] * w[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(out)[i, j], expect, rtol=1e-3, atol=1e-4)
    assert (np.asarray(out)[1, 70:] == 0).all()


def test_vector_attention_primitives():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(1, 10, 4, 8)).astype(np.float32))
    kg = jnp.asarray(rng.normal(size=(1, 10, 6, 4, 8)).astype(np.float32))
    w = jnp.ones((8,), jnp.float32)
    rel = po.attention_relation_step(q, kg, w)
    expect = np.einsum("bmgc,bmkgc->bmkg", np.asarray(q), np.asarray(kg))
    np.testing.assert_allclose(np.asarray(rel), expect, rtol=1e-4, atol=1e-5)
    fused = po.attention_fusion_step(rel, kg)
    expect2 = np.einsum("bmkg,bmkgc->bmgc", expect, np.asarray(kg))
    np.testing.assert_allclose(np.asarray(fused), expect2, rtol=1e-4, atol=1e-4)
    sub = po.subtraction(q.reshape(1, 10, 32), kg.reshape(1, 10, 6, 32))
    assert sub.shape == (1, 10, 6, 32)
    agg = po.aggregation(kg.reshape(1, 10, 6, 32), rel, groups=4)
    np.testing.assert_allclose(
        np.asarray(agg).reshape(1, 10, 4, 8), expect2, rtol=1e-4, atol=1e-4
    )


def test_grid_cluster_plan_counts():
    rng = np.random.default_rng(8)
    coord, mask = _cloud(rng)
    plan = po.grid_cluster_plan(coord, mask, grid_size=0.5, out_capacity=256)
    c, m = np.asarray(coord), np.asarray(mask)
    for i in range(2):
        start = c[i, m[i]].min(0)
        vox = np.floor((c[i, m[i]] - start) / 0.5).astype(np.int64)
        n_unique = len(np.unique(vox, axis=0))
        assert int(np.asarray(plan.n_clusters)[i]) == n_unique
        # every valid point maps to a cluster whose members share its voxel
        cl = np.asarray(plan.cluster_of_point)[i][m[i]]
        assert cl.max() < n_unique
        key = vox[:, 0] * 10**8 + vox[:, 1] * 10**4 + vox[:, 2]
        assert len(np.unique(key)) == n_unique
        for cid in np.unique(cl)[:20]:
            members = key[cl == cid]
            assert (members == members[0]).all()
