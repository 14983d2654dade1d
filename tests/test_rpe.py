"""PTv3 RPE dense path: bias changes outputs; matches plain path when zero."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model
from scenesplat_tpu.ops.window_attention import (
    window_attention_reference,
    window_attention_rpe,
)


def test_rpe_zero_table_matches_plain():
    rng = np.random.default_rng(0)
    b, n, h, c, k = 2, 64, 2, 16, 16
    qkv = jnp.asarray(rng.normal(size=(b, n, 3, c)).astype(np.float32))
    valid = jnp.asarray(np.arange(n)[None, :].repeat(b, 0) <
                        np.array([[64], [40]]))
    grid = jnp.asarray(rng.integers(0, 20, (b, n, 3)).astype(np.int32))
    pos_bnd = int((4 * k) ** (1 / 3) * 2)
    table = jnp.zeros((3 * (2 * pos_bnd + 1), h), jnp.float32)
    a = window_attention_rpe(qkv, valid, grid, table, k, h)
    ref = window_attention_reference(qkv, valid, k, h)
    # compare VALID rows only: fully-masked padding rows are uniform junk
    # under the RPE path's biased softmax but exact zeros under the plain
    # path's masked-exp softmax (window_attention._masked_softmax) — both
    # are masked downstream
    m = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(a) * m, np.asarray(ref) * m,
                               rtol=1e-5, atol=1e-5)

    # nonzero table changes the result
    table2 = table + 0.5
    b2 = window_attention_rpe(qkv, valid, grid, table2, k, h)
    # constant bias cancels in softmax — use a position-dependent table
    t3 = jnp.asarray(
        rng.normal(size=table.shape).astype(np.float32)) * 0.5
    b3 = window_attention_rpe(qkv, valid, grid, t3, k, h)
    np.testing.assert_allclose(np.asarray(b2) * m, np.asarray(ref) * m,
                               rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(b3) * m, np.asarray(ref) * m,
                           atol=1e-3)


def test_ptv3_enable_rpe_forward():
    model = build_model(dict(
        type="PT-v3m1", in_channels=6,
        order=("z",), stride=(2,),
        enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(2, 2),
        enc_patch_size=(16, 16),
        dec_depths=(1,), dec_channels=(8,), dec_num_head=(2,),
        dec_patch_size=(16,),
        mlp_ratio=2, drop_path=0.0, serialization_depth=10,
        enable_rpe=True, use_pallas=False,
    ))
    rng = np.random.default_rng(1)
    b, n = 1, 64
    point = PointBatch.from_inputs(
        jnp.asarray(rng.uniform(0, 2, (b, n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, n, 6)).astype(np.float32)),
        grid_size=0.05,
    )
    variables = model.init(jax.random.PRNGKey(0), point)
    out = model.apply(variables, point)
    assert bool(jnp.isfinite(out.feat).all())
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("rpe_table" in jax.tree_util.keystr(kp) for kp, _ in flat)
