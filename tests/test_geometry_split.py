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
