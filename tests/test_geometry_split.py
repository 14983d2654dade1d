"""Split geometry program: precomputed plans must reproduce inline results."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model


def _cfg():
    return dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "hilbert"),
        stride=(2, 2),
        enc_depths=(1, 1, 1),
        enc_channels=(8, 16, 24),
        enc_num_head=(2, 2, 2),
        enc_patch_size=(16, 16, 16),
        dec_depths=(1, 1),
        dec_channels=(8, 16),
        dec_num_head=(2, 2),
        dec_patch_size=(16, 16),
        mlp_ratio=2,
        drop_path=0.0,
        serialization_depth=10,
        use_pallas=False,
    )


def test_geometry_split_matches_inline():
    model = build_model(_cfg())
    rng = np.random.default_rng(0)
    b, n = 2, 96
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 70:] = False
    point = PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )
    variables = model.init(jax.random.PRNGKey(0), point)
    out_inline = model.apply(variables, point)

    geom = jax.jit(model.build_geometry)(point)
    out_split = model.apply(variables, point, geometry=geom)
    np.testing.assert_allclose(
        np.asarray(out_inline.feat), np.asarray(out_split.feat),
        rtol=1e-5, atol=1e-6,
    )

    # through the LangPretrainer head too
    lang = build_model(dict(type="LangPretrainer", backbone=_cfg()))
    lv = lang.init(jax.random.PRNGKey(1), point)
    a = lang.apply(lv, point)
    bb = lang.apply(lv, point, geometry=geom)
    np.testing.assert_allclose(
        np.asarray(a.feat), np.asarray(bb.feat), rtol=1e-5, atol=1e-6
    )


def test_staged_geometry_matches_fused():
    """build_ptv3_geometry_staged (per-step jitted programs) must produce
    identical plans to the fused build_ptv3_geometry."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scenesplat_tpu.models.ptv3 import (
        build_ptv3_geometry, build_ptv3_geometry_staged,
    )
    from scenesplat_tpu.models.structure import PointBatch

    rng = np.random.default_rng(3)
    b, n = 2, 1024
    coord = rng.uniform(0, 4, (b, n, 3)).astype(np.float32)
    grid_coord = np.floor(coord / 0.05).astype(np.int32)
    mask = np.ones((b, n), bool)
    mask[0, 900:] = False
    point = PointBatch(
        coord=jnp.asarray(coord), feat=jnp.zeros((b, n, 3), jnp.float32),
        grid_coord=jnp.asarray(grid_coord), mask=jnp.asarray(mask),
    )
    kw = dict(orders=("z", "hilbert"), depth=10, num_stages=3,
              strides=(2, 2), capacities=(768, 384))
    fused = jax.jit(
        lambda p: build_ptv3_geometry(p, **kw)
    )(point)
    staged = build_ptv3_geometry_staged(point, **kw)

    flat_f, _ = jax.tree_util.tree_flatten(fused)
    flat_s, _ = jax.tree_util.tree_flatten(staged)
    assert len(flat_f) == len(flat_s)
    for a, c in zip(flat_f, flat_s):
        a, c = np.asarray(a), np.asarray(c)  # kernel_size may be a python int
        assert a.shape == c.shape
        assert (a == c).all()


def test_feature_extractor_split_geometry_matches():
    """FeatureExtractor with staged geometry (split_threshold hit) must match
    the fused in-model path."""
    import sys

    import jax
    import numpy as np

    sys.path.insert(0, "/root/repo/tests")
    from test_model import tiny_backbone_cfg

    from scenesplat_tpu.engines.infer import FeatureExtractor
    from scenesplat_tpu.models import build_model

    model = build_model(
        dict(type="LangPretrainer", backbone=tiny_backbone_cfg())
    )
    rng = np.random.default_rng(5)
    n = 300
    coord = rng.uniform(0, 1.5, (n, 3)).astype(np.float32)
    sample = {
        "coord": coord,
        "feat": rng.normal(size=(n, 5)).astype(np.float32),
        "grid_coord": np.floor(coord / 0.02).astype(np.int32),
    }
    import jax.numpy as jnp

    # init needs a patch-multiple point count (the extractor pads internally)
    n_pad = ((n + 15) // 16) * 16
    pad = n_pad - n

    def padded(x):
        return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    mask_init = np.zeros(n_pad, bool)
    mask_init[:n] = True
    pb_init = __import__(
        "scenesplat_tpu.models.structure", fromlist=["PointBatch"]
    ).PointBatch(
        coord=jnp.asarray(padded(coord))[None],
        feat=jnp.asarray(padded(sample["feat"]))[None],
        grid_coord=jnp.asarray(padded(sample["grid_coord"]))[None],
        mask=jnp.asarray(mask_init)[None],
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        pb_init,
        train=False,
    )

    fused = FeatureExtractor(model, patch_size=16, split_threshold=1 << 30)
    staged = FeatureExtractor(model, patch_size=16, split_threshold=1)
    assert staged._geom_backbone is not None
    out_f = fused(variables, sample)
    out_s = staged(variables, sample)
    np.testing.assert_allclose(out_f, out_s, rtol=1e-5, atol=1e-6)


def test_staged_geometry_chunked_conv(monkeypatch):
    """Tiny join budget forces multi-program conv plans; results unchanged."""
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    import scenesplat_tpu.models.ptv3 as ptv3_mod
    from scenesplat_tpu.models.structure import PointBatch

    monkeypatch.setattr(ptv3_mod, "_JOIN_ELEMS_PER_PROGRAM", 4096)

    rng = np.random.default_rng(7)
    b, n = 1, 512
    coord = rng.uniform(0, 3, (b, n, 3)).astype(np.float32)
    grid_coord = np.floor(coord / 0.05).astype(np.int32)
    point = PointBatch(
        coord=jnp.asarray(coord), feat=jnp.zeros((b, n, 3), jnp.float32),
        grid_coord=jnp.asarray(grid_coord),
        mask=jnp.ones((b, n), bool),
    )
    kw = dict(orders=("z",), depth=10, num_stages=2, strides=(2,),
              capacities=(384,))
    fused = jax.jit(lambda p: ptv3_mod.build_ptv3_geometry(p, **kw))(point)
    staged = ptv3_mod.build_ptv3_geometry_staged(point, **kw)

    def check_plan(a, c):
        va, vc = np.asarray(a.neighbor_valid), np.asarray(c.neighbor_valid)
        assert (va == vc).all()
        ia, ic = np.asarray(a.neighbor_index), np.asarray(c.neighbor_index)
        # invalid slots hold arbitrary payloads; compare valid ones only
        assert (ia[va] == ic[vc]).all()

    check_plan(fused.stem_plan, staged.stem_plan)
    for sf, ss in zip(fused.states, staged.states):
        check_plan(sf.conv_plan, ss.conv_plan)
        for a, c in zip(jax.tree_util.tree_leaves(sf._replace(conv_plan=None)),
                        jax.tree_util.tree_leaves(ss._replace(conv_plan=None))):
            assert (np.asarray(a) == np.asarray(c)).all()
    for a, c in zip(jax.tree_util.tree_leaves(fused.plans),
                    jax.tree_util.tree_leaves(staged.plans)):
        assert (np.asarray(a) == np.asarray(c)).all()


def test_dense_extent_geometry_matches_join():
    """dense_extent conv plans must equal the merge-join plans end-to-end
    (fused, staged, and inline-forward paths)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.models.ptv3 import (
        build_ptv3_geometry, build_ptv3_geometry_staged,
    )
    from scenesplat_tpu.models.structure import PointBatch as PB

    rng = np.random.default_rng(7)
    b, n = 2, 768
    # unique voxels per scene (GridSample contract)
    gcs = []
    for _ in range(b):
        cells = rng.permutation(40 * 40 * 24)[:n]
        gcs.append(np.stack(np.unravel_index(cells, (40, 40, 24)), -1))
    grid_coord = np.stack(gcs).astype(np.int32)
    coord = grid_coord * 0.05 + 0.01
    mask = np.ones((b, n), bool)
    mask[1, 700:] = False
    point = PB(
        coord=jnp.asarray(coord.astype(np.float32)),
        feat=jnp.zeros((b, n, 3), jnp.float32),
        grid_coord=jnp.asarray(grid_coord), mask=jnp.asarray(mask),
    )
    kw = dict(orders=("z", "hilbert"), depth=10, num_stages=3,
              strides=(2, 2), capacities=(512, 256))
    join = jax.jit(lambda p: build_ptv3_geometry(p, **kw))(point)
    dense = jax.jit(
        lambda p: build_ptv3_geometry(p, dense_extent=(40, 40, 24), **kw)
    )(point)
    staged = build_ptv3_geometry_staged(
        point, dense_extent=(40, 40, 24), **kw
    )
    def check_conv_plan(pj, po):
        vj = np.asarray(pj.neighbor_valid)
        vo = np.asarray(po.neighbor_valid)
        np.testing.assert_array_equal(vj, vo)
        np.testing.assert_array_equal(
            np.asarray(pj.neighbor_index)[vj], np.asarray(po.neighbor_index)[vj]
        )

    for other in (dense, staged):
        check_conv_plan(join.stem_plan, other.stem_plan)
        for sj, so in zip(join.states, other.states):
            check_conv_plan(sj.conv_plan, so.conv_plan)
            for fj, fo in zip(sj[:-1], so[:-1]):  # coord..ser fields
                for a, c in zip(jax.tree_util.tree_leaves(fj),
                                jax.tree_util.tree_leaves(fo)):
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
        for pj, po in zip(join.plans, other.plans):
            for a, c in zip(jax.tree_util.tree_leaves(pj),
                            jax.tree_util.tree_leaves(po)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # inline forward with dense_extent == forward with join geometry
    cfg = dict(
        type="PT-v3m1", in_channels=3, order=("z", "hilbert"),
        stride=(2, 2), enc_depths=(1, 1, 1), enc_channels=(8, 16, 24),
        enc_num_head=(2, 2, 2), enc_patch_size=(16, 16, 16),
        dec_depths=(1, 1), dec_channels=(8, 16), dec_num_head=(2, 2),
        dec_patch_size=(16, 16), mlp_ratio=2, drop_path=0.0,
        serialization_depth=10, use_pallas=False,
    )
    point = point.replace(feat=jnp.asarray(
        rng.normal(size=(b, n, 3)).astype(np.float32)))
    m_join = build_model(cfg)
    m_dense = build_model(dict(cfg, dense_extent=(40, 40, 24)))
    variables = m_join.init(jax.random.PRNGKey(0), point)
    out_j = m_join.apply(variables, point)
    out_d = m_dense.apply(variables, point)
    np.testing.assert_allclose(
        np.asarray(out_j.feat), np.asarray(out_d.feat), rtol=1e-5, atol=1e-6
    )


def test_hash_grid_geometry_matches_join():
    """hash_grid conv plans must equal the merge-join plans end-to-end at
    UNBOUNDED extents no dense_extent could afford (fused, staged, and
    inline-forward paths) — the outdoor KITTI-360/HoliCity configuration."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scenesplat_tpu.models import build_model
    from scenesplat_tpu.models.ptv3 import (
        build_ptv3_geometry, build_ptv3_geometry_staged,
    )
    from scenesplat_tpu.models.structure import PointBatch as PB

    rng = np.random.default_rng(17)
    b, n = 2, 768
    # unique voxels per scene, spread over a 2000-cell/axis grid (100 m at
    # 5 cm) — coords far beyond the packed-u32 24-bit lane split too
    gcs = []
    for _ in range(b):
        cells = np.unique(rng.integers(0, 2000**3, 4 * n, dtype=np.int64))
        cells = rng.permutation(cells)[:n]
        gcs.append(np.stack(np.unravel_index(cells, (2000,) * 3), -1))
    grid_coord = np.stack(gcs).astype(np.int32)
    coord = grid_coord * 0.05 + 0.01
    mask = np.ones((b, n), bool)
    mask[1, 700:] = False
    point = PB(
        coord=jnp.asarray(coord.astype(np.float32)),
        feat=jnp.zeros((b, n, 3), jnp.float32),
        grid_coord=jnp.asarray(grid_coord), mask=jnp.asarray(mask),
    )
    kw = dict(orders=("z", "hilbert"), depth=12, num_stages=3,
              strides=(2, 2), capacities=(512, 256))
    join = jax.jit(lambda p: build_ptv3_geometry(p, **kw))(point)
    hashed = jax.jit(
        lambda p: build_ptv3_geometry(p, hash_grid=True, **kw)
    )(point)
    staged = build_ptv3_geometry_staged(point, hash_grid=True, **kw)

    def check_conv_plan(pj, po):
        vj = np.asarray(pj.neighbor_valid)
        np.testing.assert_array_equal(vj, np.asarray(po.neighbor_valid))
        np.testing.assert_array_equal(
            np.asarray(pj.neighbor_index)[vj], np.asarray(po.neighbor_index)[vj]
        )

    for other in (hashed, staged):
        check_conv_plan(join.stem_plan, other.stem_plan)
        for sj, so in zip(join.states, other.states):
            check_conv_plan(sj.conv_plan, so.conv_plan)
            for fj, fo in zip(sj[:-1], so[:-1]):  # coord..ser fields
                for a, c in zip(jax.tree_util.tree_leaves(fj),
                                jax.tree_util.tree_leaves(fo)):
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # inline forward with hash_grid == forward with join geometry
    cfg = dict(
        type="PT-v3m1", in_channels=3, order=("z", "hilbert"),
        stride=(2, 2), enc_depths=(1, 1, 1), enc_channels=(8, 16, 24),
        enc_num_head=(2, 2, 2), enc_patch_size=(16, 16, 16),
        dec_depths=(1, 1), dec_channels=(8, 16), dec_num_head=(2, 2),
        dec_patch_size=(16, 16), mlp_ratio=2, drop_path=0.0,
        serialization_depth=12, use_pallas=False,
    )
    point = point.replace(feat=jnp.asarray(
        rng.normal(size=(b, n, 3)).astype(np.float32)))
    m_join = build_model(cfg)
    m_hash = build_model(dict(cfg, hash_grid=True))
    variables = m_join.init(jax.random.PRNGKey(0), point)
    out_j = m_join.apply(variables, point)
    out_h = m_hash.apply(variables, point)
    np.testing.assert_allclose(
        np.asarray(out_j.feat), np.asarray(out_h.feat), rtol=1e-5, atol=1e-6
    )
