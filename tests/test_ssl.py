"""SimDINO SSL pretraining: losses, mask generator, and a full pretrainer
cycle on synthetic data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenesplat_tpu.utils.config import Config


def test_mcr_loss_properties(rng):
    from scenesplat_tpu.models.ssl import mcr_loss

    m, d = 16, 32
    base = rng.normal(size=(m, d))
    base = jnp.asarray(base / np.linalg.norm(base, axis=1, keepdims=True), jnp.float32)
    # all crops identical -> off-diagonal cosine = 1 -> max compression
    loss_same, met = mcr_loss([base] * 5, [base] * 2)
    assert float(met["mcr_comp_loss"]) == pytest.approx(1.0, abs=1e-5)
    # independent random crops -> compression ~ 0
    others = [rng.normal(size=(m, d)) for _ in range(5)]
    others = [
        jnp.asarray(o / np.linalg.norm(o, axis=1, keepdims=True), jnp.float32)
        for o in others
    ]
    loss_diff, met2 = mcr_loss(others, others[:2])
    assert float(met["mcr_comp_loss"]) > float(met2["mcr_comp_loss"])
    assert np.isfinite(float(loss_same)) and np.isfinite(float(loss_diff))
    # expansion rewards diverse (full-rank) embeddings over a collapsed code
    # (all samples mapped to the same unit vector -> rank-1 covariance)
    collapsed = jnp.broadcast_to(base[:1], base.shape)
    _, met3 = mcr_loss([collapsed] * 5, [collapsed] * 2)
    assert float(met["mcr_expa_loss"]) > float(met3["mcr_expa_loss"])


def test_cosine_patch_loss(rng):
    from scenesplat_tpu.models.ssl import cosine_patch_loss

    t = jnp.asarray(rng.normal(size=(10, 8)), jnp.float32)
    t = t / jnp.linalg.norm(t, axis=1, keepdims=True)
    w = jnp.ones(10) / 10
    # perfectly aligned student minimizes the loss (-1)
    assert float(cosine_patch_loss(t, t, w)) == pytest.approx(-1.0, abs=1e-5)
    assert float(cosine_patch_loss(-t, t, w)) == pytest.approx(1.0, abs=1e-5)


def test_mask_generator_shapes_and_rates(rng):
    from scenesplat_tpu.models.ssl import generate_token_masks

    b, n = 4, 512
    coord = jnp.asarray(rng.uniform(0, 2, (b, n, 3)), jnp.float32)
    mask = jnp.ones((b, n), bool)
    for mt in ["splats", "patch"]:
        tm, w = generate_token_masks(
            jax.random.PRNGKey(0), coord, mask, mask_type=mt,
            mask_sample_probability=1.0, mask_ratio_min_max=(0.3, 0.3),
        )
        assert tm.shape == (b, n) and w.shape == (b, n)
        frac = np.asarray(tm).mean(axis=1)
        assert (frac > 0.1).all() and (frac < 0.6).all(), frac
        # weights live only on masked points
        assert (np.asarray(w)[~np.asarray(tm)] == 0).all()
    # masking off -> empty masks
    tm, _ = generate_token_masks(
        jax.random.PRNGKey(0), coord, mask, mask_sample_probability=0.0
    )
    assert not np.asarray(tm).any()


@pytest.fixture(scope="module")
def ssl_data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ssl_gs")
    rng = np.random.default_rng(5)
    for i in range(4):
        scene = root / "train" / f"scene{i:04d}"
        scene.mkdir(parents=True)
        n = int(rng.integers(600, 900))
        np.save(scene / "coord.npy", rng.uniform(0, 3, (n, 3)).astype(np.float32))
        np.save(scene / "color.npy", rng.uniform(0, 255, (n, 3)).astype(np.float32))
        np.save(scene / "quat.npy", rng.normal(size=(n, 4)).astype(np.float32))
        np.save(scene / "scale.npy", rng.uniform(0, 1, (n, 3)).astype(np.float32))
        np.save(scene / "opacity.npy", rng.uniform(0.1, 1, (n,)).astype(np.float32))
    return str(root)


def test_ssl_pretrainer_cycle(ssl_data_root, tmp_path):
    from scenesplat_tpu.engines.pretrain import DefaultSSLPreTrainer

    view_keys = ("coord", "color", "scale", "quat", "opacity")
    crop_transform = [
        dict(type="GridSample", grid_size=0.05, mode="train", keys=view_keys,
             return_grid_coord=True),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
    ]
    cfg = Config(
        dict(
            seed=0,
            save_path=str(tmp_path / "ssl_exp"),
            batch_size=2,
            num_worker=2,
            epoch=1,
            clip_grad=1.0,
            model=dict(
                type="SimDINOSSL",
                local_crop_num=2,
                do_ema=True,
                do_ibot=True,
                enable_mae_loss=True,
                mask_ratio_min_max=(0.1, 0.5),
                mask_sample_probability=1.0,
                mask_grid_size=0.2,
                mask_type="patch",
                dino_out_dim=16,
                dino_hidden_dim=32,
                ibot_out_dim=8,
                ibot_hidden_dim=16,
                backbone=dict(
                    type="PT-v3m1",
                    in_channels=11,
                    order=("z", "hilbert"),
                    stride=(2, 2),
                    enc_depths=(1, 1, 1),
                    enc_channels=(8, 16, 24),
                    enc_num_head=(2, 2, 2),
                    enc_patch_size=(32, 32, 32),
                    dec_depths=(1, 1),
                    dec_channels=(8, 16),
                    dec_num_head=(2, 2),
                    dec_patch_size=(32, 32),
                    mlp_ratio=2,
                    drop_path=0.0,
                    pool_reduce="max",
                    serialization_depth=10,
                    use_pallas=False,
                ),
            ),
            optimizer=dict(type="AdamW", lr=1e-3, weight_decay=1e-3),
            scheduler=dict(type="OneCycleLR", max_lr=[1e-3, 1e-4], pct_start=0.3,
                           div_factor=10.0, final_div_factor=100.0),
            param_dicts=[dict(keyword="block", lr=1e-4)],
            train=dict(type="DefaultSSLPreTrainer"),
            hooks=[
                dict(type="IterationTimer"),
                dict(type="InformationWriter", log_interval=1),
                dict(type="CheckpointSaver"),
            ],
            data=dict(
                num_points=512,
                num_points_local=256,
                train=dict(
                    type="GenericGSDataset",
                    split="train",
                    data_root=ssl_data_root,
                    transform=[
                        dict(type="CenterShift", apply_z=True),
                        dict(type="RandomRotate", angle=[-1, 1], axis="z",
                             center=[0, 0, 0], p=0.5),
                        dict(
                            type="ContrastiveViewsGenerator_SSL",
                            local_crop_num=2,
                            view_keys=view_keys,
                            global_base_transform=[
                                dict(type="CenterShift", apply_z=False),
                                dict(type="RandomFlip", p=0.5),
                            ],
                            local_base_transform=[
                                dict(type="CenterShift", apply_z=False),
                                dict(type="SphereCropRandomMaxPoints",
                                     random_scale=(0.2, 0.5), point_max=800),
                            ],
                            global_transform0=crop_transform,
                            global_transform1=[
                                dict(type="RandomDropout", dropout_ratio=0.2,
                                     dropout_application_ratio=0.5),
                            ] + crop_transform,
                            local_transform=crop_transform,
                        ),
                        dict(
                            type="CollectContrast",
                            keys_prefix=("global_crop0", "global_crop1",
                                         "local_crop0", "local_crop1"),
                            global_crop0_feat_keys=tuple(
                                f"global_crop0_{k}" for k in
                                ("color", "opacity", "quat", "scale")),
                            global_crop1_feat_keys=tuple(
                                f"global_crop1_{k}" for k in
                                ("color", "opacity", "quat", "scale")),
                            local_crop0_feat_keys=tuple(
                                f"local_crop0_{k}" for k in
                                ("color", "opacity", "quat", "scale")),
                            local_crop1_feat_keys=tuple(
                                f"local_crop1_{k}" for k in
                                ("color", "opacity", "quat", "scale")),
                        ),
                    ],
                ),
            ),
        )
    )
    trainer = DefaultSSLPreTrainer(cfg)
    teacher_before = jax.tree_util.tree_leaves(trainer.state.teacher_params)[0].copy()
    trainer.train()
    hist = trainer.storage.history("loss")
    assert hist._count >= 2
    assert np.isfinite(hist.latest())
    # teacher moved by EMA
    teacher_after = jax.tree_util.tree_leaves(trainer.state.teacher_params)[0]
    assert not np.allclose(np.asarray(teacher_before), np.asarray(teacher_after))
    # dino + ibot + mae all contributed
    for key in ("sim_dino_crops_loss", "sim_ibot_patch_loss", "global_mae_loss"):
        assert np.isfinite(trainer.storage.history(key).latest())

    # the EMA teacher is checkpointed and restored on resume (the saver's
    # "extra" section carries trainer-specific state fields)
    cfg2 = Config(dict(cfg))
    cfg2["weight"] = str(tmp_path / "ssl_exp" / "model" / "model_last")
    cfg2["resume"] = True
    cfg2["hooks"] = list(cfg2["hooks"]) + [dict(type="CheckpointLoader")]
    trainer2 = DefaultSSLPreTrainer(cfg2)
    trainer2.call_hooks("before_train")
    t_saved = jax.tree_util.tree_leaves(trainer.state.teacher_params)
    t_restored = jax.tree_util.tree_leaves(trainer2.state.teacher_params)
    for a, b in zip(t_saved, t_restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
