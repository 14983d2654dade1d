"""MSC-v1m1: two-view collate, cross masks, contrastive pairs, loss/grads."""

import jax
import jax.numpy as jnp
import numpy as np

from scenesplat_tpu.data.collate import collate_two_view
from scenesplat_tpu.data.transforms import TRANSFORMS
from scenesplat_tpu.models import build_model


def _two_view_samples(rng, n_scenes=2, n=120):
    samples = []
    for _ in range(n_scenes):
        base = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        s = {}
        for prefix in ("view1", "view2"):
            jitter = rng.normal(0, 0.002, (n, 3)).astype(np.float32)
            coord = base + jitter
            s[f"{prefix}_origin_coord"] = base.copy()
            s[f"{prefix}_coord"] = coord
            s[f"{prefix}_grid_coord"] = np.floor(coord / 0.04).astype(np.int32)
            s[f"{prefix}_feat"] = rng.normal(size=(n, 6)).astype(np.float32)
            s[f"{prefix}_color"] = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
            s[f"{prefix}_normal"] = rng.normal(size=(n, 3)).astype(np.float32)
        samples.append(s)
    return samples


def test_two_view_generator_and_collate():
    gen = TRANSFORMS.build(dict(
        type="ContrastiveViewsGenerator",
        view_keys=("coord", "color"),
        view_trans_cfg=[dict(type="CenterShift", apply_z=True)],
    ))
    rng = np.random.default_rng(0)
    d = dict(
        coord=rng.uniform(0, 2, (50, 3)).astype(np.float32),
        color=rng.uniform(0, 1, (50, 3)).astype(np.float32),
    )
    out = gen(d)
    assert "view1_coord" in out and "view2_color" in out

    samples = _two_view_samples(rng)
    batch = collate_two_view(samples, view_points=128)
    assert batch["view1_coord"].shape == (2, 128, 3)
    assert batch["view2_origin_coord"].shape == (2, 128, 3)
    assert batch["view1_mask"].sum() == 240


def _msc_model():
    return build_model(dict(
        type="MSC-v1m1",
        backbone=dict(
            type="SpUNetNoSkipBase", in_channels=6, num_classes=0,
            base_channels=8, channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
            serialization_depth=10, stage_capacity=(1.0, 1.0),
        ),
        backbone_in_channels=6,
        backbone_out_channels=5,
        mask_grid_size=0.2,
        mask_rate=0.4,
        matching_max_k=4,
        matching_max_radius=0.05,
        matching_max_pair=64,
        knn_tile=64,
    ))


def test_msc_forward_loss_and_grads():
    rng = np.random.default_rng(1)
    samples = _two_view_samples(rng)
    batch = {
        k: jnp.asarray(v) for k, v in collate_two_view(samples, 128).items()
    }
    model = _msc_model()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    out, _ = model.apply(
        variables, batch, train=True, mutable=["batch_stats"],
        rngs={"shuffle": jax.random.PRNGKey(2)},
    )
    assert set(out) >= {"loss", "nce_loss", "pos_sim", "neg_sim", "color_loss",
                        "normal_loss"}
    assert bool(jnp.isfinite(out["loss"]))
    # identical views at small jitter: matched pairs exist, nce finite > 0
    assert float(out["nce_loss"]) > 0

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
            rngs={"shuffle": jax.random.PRNGKey(2)},
        )
        return o["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert float(jnp.abs(grads["mask_token"]).max()) >= 0


def test_msc_cross_masks_disjoint():
    rng = np.random.default_rng(2)
    samples = _two_view_samples(rng, n_scenes=1, n=200)
    batch = {
        k: jnp.asarray(v) for k, v in collate_two_view(samples, 200).items()
    }
    model = _msc_model()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )

    def masks(batch):
        m1, m2 = model.apply(
            variables, jax.random.PRNGKey(5),
            batch["view1_origin_coord"], batch["view1_mask"],
            batch["view2_origin_coord"], batch["view2_mask"],
            method=model.generate_cross_masks,
        )
        return np.asarray(m1), np.asarray(m2)

    m1, m2 = masks(batch)
    # same origin coords => same patches; tags 1 and 2 are disjoint
    assert not (m1 & m2).any()
    rate1 = m1.sum() / 200
    rate2 = m2.sum() / 200
    assert 0.1 < rate1 < 0.7 and 0.1 < rate2 < 0.7
