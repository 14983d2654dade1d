"""PPT v1m1/v1m2 with PDNorm-conditioned SpUNet-v1m3."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model


def _batch(rng, b=2, n=96):
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 70:] = False
    return PointBatch.from_inputs(
        jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
        grid_size=0.05,
    )


def _backbone():
    return dict(
        type="SpUNet-v1m3", in_channels=6, num_classes=0,
        base_channels=8, channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
        serialization_depth=10, stage_capacity=(1.0, 1.0),
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        context_channels=16,
    )


def test_ppt_v1m1_language_guided():
    model = build_model(dict(
        type="PPT-v1m1",
        backbone=_backbone(),
        backbone_out_channels=8,
        context_channels=16,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        class_name=("wall", "floor", "chair", "table", "sofa"),
        valid_index=((0, 1, 2), (0, 1, 2, 3), (0, 1, 4)),
        text_channels=12,
    ))
    point = _batch(np.random.default_rng(0))
    cond = jnp.asarray(1, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), point, cond)
    out = model.apply(variables, point, cond)
    logits = np.asarray(out.feat)
    # LOCAL class space like the reference (v1m1 l.157-161): max_k = 4
    # slots; condition 1 (ScanNet) has 4 valid classes, none masked
    assert logits.shape == (2, 96, 4)
    assert np.isfinite(logits[np.asarray(out.mask)]).all()
    # different condition selects different norms => different outputs
    out0 = model.apply(variables, point, jnp.asarray(0, jnp.int32))
    assert not np.allclose(np.asarray(out0.feat)[..., :3], logits[..., :3])


def test_ppt_v1m2_decoupled_heads():
    model = build_model(dict(
        type="PPT-v1m2",
        backbone=_backbone(),
        backbone_out_channels=8,
        context_channels=16,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        num_classes=(5, 4, 3),
    ))
    point = _batch(np.random.default_rng(1))
    variables = model.init(
        jax.random.PRNGKey(0), point, jnp.asarray(0, jnp.int32)
    )
    out2 = model.apply(variables, point, jnp.asarray(2, jnp.int32))
    logits = np.asarray(out2.feat)
    assert logits.shape == (2, 96, 5)
    assert (logits[..., 3:] < -1e8).all()  # S3DIS has 3 classes
    assert np.isfinite(logits[..., :3]).all()


def test_ppt_train_step_wiring():
    from scenesplat_tpu.engines.train_step import make_train_step, create_train_state
    import optax

    model = build_model(dict(
        type="PPT-v1m2",
        backbone=_backbone(),
        backbone_out_channels=8,
        context_channels=16,
        conditions=("A", "B", "C"),
        num_classes=(5, 4, 3),
    ))
    rng = np.random.default_rng(2)
    point = _batch(rng)
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, tx, point, extra_args=(jnp.zeros((), jnp.int32),)
    )

    def ce(logits, seg, mask=None):
        logp = jax.nn.log_softmax(logits)
        pick = jnp.take_along_axis(
            logp, jnp.maximum(seg, 0)[..., None], axis=-1
        )[..., 0]
        w = (mask & (seg >= 0)).astype(jnp.float32)
        return -(pick * w).sum() / jnp.maximum(w.sum(), 1.0)

    step = make_train_step(model, ce, tx, task="ppt")
    batch = dict(
        coord=point.coord, feat=point.feat, grid_coord=point.grid_coord,
        mask=point.mask,
        segment=jnp.asarray(rng.integers(0, 4, (2, 96)), jnp.int32),
        condition_index=jnp.asarray(1, jnp.int32),
    )
    new_state, metrics = step(state, batch)
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(new_state.step) == 1


def test_ppt_with_ptv3_pdnorm_backbone():
    model = build_model(dict(
        type="PPT-v1m2",
        backbone=dict(
            type="PT-v3m1", in_channels=6,
            order=("z",), stride=(2,),
            enc_depths=(1, 1), enc_channels=(8, 16), enc_num_head=(2, 2),
            enc_patch_size=(16, 16),
            dec_depths=(1,), dec_channels=(8,), dec_num_head=(2,),
            dec_patch_size=(16,),
            mlp_ratio=2, drop_path=0.0, serialization_depth=10,
            use_pallas=False,
            pdnorm_conditions=("Structured3D", "ScanNet", "S3DIS"),
            pdnorm_adaptive=True,
            context_channels=16,
        ),
        backbone_out_channels=8,
        context_channels=16,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        num_classes=(5, 4, 3),
    ))
    point = _batch(np.random.default_rng(3))
    variables = model.init(
        jax.random.PRNGKey(0), point, jnp.asarray(0, jnp.int32)
    )
    out0 = model.apply(variables, point, jnp.asarray(0, jnp.int32))
    out1 = model.apply(variables, point, jnp.asarray(1, jnp.int32))
    assert out0.feat.shape == (2, 96, 5)
    assert bool(jnp.isfinite(np.asarray(out0.feat)[..., :5].max()))
    # per-condition norms + adaptive context => different features
    a = np.asarray(out0.feat)[..., :3]
    b = np.asarray(out1.feat)[..., :3]
    assert not np.allclose(a, b)
