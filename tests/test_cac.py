"""CAC segmentor: train loss terms, eval logits, prototype refinement."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.models import PointBatch, build_model


def _model():
    return build_model(dict(
        type="CAC-v1m1",
        num_classes=5,
        backbone_out_channels=8,
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=0,
            base_channels=8, channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
            serialization_depth=10, stage_capacity=(1.0, 1.0),
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    ))


def _batch(rng, b=2, n=96):
    coord = rng.uniform(0, 2, (b, n, 3)).astype(np.float32)
    feat = rng.normal(size=(b, n, 6)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 60:] = False
    seg = rng.integers(-1, 5, (b, n)).astype(np.int32)
    return (
        PointBatch.from_inputs(
            jnp.asarray(coord), jnp.asarray(feat), mask=jnp.asarray(mask),
            grid_size=0.05,
        ),
        jnp.asarray(seg),
    )


def test_cac_train_losses_and_eval():
    model = _model()
    point, seg = _batch(np.random.default_rng(0))
    variables = model.init(jax.random.PRNGKey(0), point, train=False)

    out, _ = model.apply(
        variables, point, train=True, segment=seg, mutable=["batch_stats"]
    )
    assert set(out) == {"loss", "seg_loss", "pre_loss", "pre_self_loss", "kl_loss"}
    for v in out.values():
        assert bool(jnp.isfinite(v))

    ev = model.apply(variables, point, train=False)
    assert ev.feat.shape == (2, 96, 5)
    assert bool(jnp.isfinite(ev.feat[ev.mask]).all())


def test_cac_grads():
    model = _model()
    point, seg = _batch(np.random.default_rng(1))
    variables = model.init(jax.random.PRNGKey(0), point, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            point, train=True, segment=seg, mutable=["batch_stats"],
        )
        return out["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # the seg head must receive gradient through all three logit paths
    assert float(jnp.abs(grads["seg_kernel"]).max()) > 0
