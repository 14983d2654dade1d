"""End-to-end engine test: config -> trainer -> hooks -> eval -> checkpoints
-> tester, on a synthetic 3DGS dataset (mirrors the reference's
test_single_scene_lang.py smoke-test strategy, SURVEY.md section 4)."""

import os

import numpy as np
import pytest

from scenesplat_tpu.utils.config import Config


D_LANG = 16
N_CLASSES = 6


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_gs")
    rng = np.random.default_rng(11)
    # text embeddings + label names
    emb = rng.normal(size=(N_CLASSES, D_LANG)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    np.save(root / "text_embeddings.npy", emb)
    with open(root / "labels.txt", "w") as f:
        f.write("\n".join(["wall", "floor", "chair", "table", "sofa", "lamp"]))
    for split, n_scenes in [("train", 4), ("val", 2)]:
        for i in range(n_scenes):
            scene = root / split / f"scene{i:04d}"
            scene.mkdir(parents=True)
            n = int(rng.integers(500, 900))
            seg = rng.integers(0, N_CLASSES, n).astype(np.int16)
            coord = rng.uniform(0, 3, (n, 3)).astype(np.float32)
            # lang_feat correlated with class => learnable signal
            lang = emb[seg] + 0.05 * rng.normal(size=(n, D_LANG))
            np.save(scene / "coord.npy", coord)
            np.save(scene / "color.npy", rng.uniform(0, 255, (n, 3)).astype(np.float32))
            np.save(scene / "quat.npy", rng.normal(size=(n, 4)).astype(np.float32))
            np.save(scene / "scale.npy", rng.uniform(0, 1, (n, 3)).astype(np.float32))
            np.save(scene / "opacity.npy", rng.uniform(0, 1, (n,)).astype(np.float32))
            np.save(scene / "segment.npy", seg)
            np.save(scene / "lang_feat.npy", lang.astype(np.float16))
            np.save(scene / "valid_feat_mask.npy", rng.random(n) > 0.2)
            if split == "val":
                np.save(scene / "pc_coord.npy", coord[: n // 2] + 0.01)
                np.save(scene / "pc_segment.npy", seg[: n // 2].astype(np.int32))
    return str(root)


def make_cfg(data_root, save_path):
    feat_keys = ("color", "opacity", "quat", "scale")
    gs_keys = (
        "coord", "color", "opacity", "quat", "scale", "segment",
        "lang_feat", "valid_feat_mask",
    )
    train_transform = [
        dict(type="CenterShift", apply_z=True),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
        dict(type="RandomFlip", p=0.5),
        dict(
            type="GridSample", grid_size=0.05, mode="train", keys=gs_keys,
            return_grid_coord=True,
        ),
        dict(type="SphereCrop", point_max=512, mode="random"),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(
            type="Collect",
            keys=("coord", "grid_coord", "segment", "lang_feat", "valid_feat_mask"),
            feat_keys=feat_keys,
        ),
    ]
    val_transform = [
        dict(type="CenterShift", apply_z=True),
        dict(
            type="GridSample", grid_size=0.05, mode="train", keys=gs_keys,
            return_grid_coord=True,
        ),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(
            type="Collect",
            keys=(
                "coord", "grid_coord", "segment", "lang_feat",
                "valid_feat_mask", "pc_coord", "pc_segment",
            ),
            feat_keys=feat_keys,
        ),
    ]
    test_transform = [
        dict(type="CenterShift", apply_z=True),
        dict(type="NormalizeColor"),
        dict(
            type="Copy",
            keys_dict=dict(segment="origin_segment", coord="origin_coord",
                           valid_feat_mask="origin_feat_mask"),
        ),
        dict(
            type="GridSample", grid_size=0.02, mode="train", keys=gs_keys,
            apply_to_pc=False, return_inverse=True,
        ),
    ]
    cfg = Config(
        dict(
            seed=0,
            save_path=save_path,
            batch_size=2,
            num_worker=2,
            mix_prob=0.5,
            clip_grad=1.0,
            epoch=2,
            model=dict(
                type="LangPretrainer",
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
                    dec_channels=(D_LANG, 16),
                    dec_num_head=(2, 2),
                    dec_patch_size=(32, 32),
                    mlp_ratio=2,
                    drop_path=0.1,
                    serialization_depth=10,
                    use_pallas=False,
                ),
                criteria=[
                    dict(type="CosineSimilarity", loss_weight=1.0),
                    dict(type="L2Loss", loss_weight=1.0),
                    dict(
                        type="AggregatedContrastiveLoss",
                        loss_weight=0.02,
                        schedule="last_75",
                        num_classes=N_CLASSES,
                        min_samples=5,
                    ),
                ],
            ),
            optimizer=dict(type="AdamW", lr=3e-3, weight_decay=0.01),
            scheduler=dict(
                type="OneCycleLR", max_lr=[3e-3, 3e-4], pct_start=0.1,
                div_factor=10.0, final_div_factor=100.0,
            ),
            param_dicts=[dict(keyword="block", lr=3e-4)],
            train=dict(type="DefaultTrainer"),
            data=dict(
                num_classes=N_CLASSES,
                ignore_index=-1,
                num_points=1024,
                train=dict(
                    type="ScanNetPPGSDataset",
                    split="train",
                    data_root=data_root,
                    transform=train_transform,
                ),
                val=dict(
                    type="ScanNetPPGSDataset",
                    split="val",
                    data_root=data_root,
                    is_train=False,
                    transform=val_transform,
                ),
                test=dict(
                    type="ScanNetPPGSDataset",
                    split="val",
                    data_root=data_root,
                    is_train=False,
                    transform=test_transform,
                    test_mode=True,
                    test_cfg=dict(
                        voxelize=dict(
                            type="GridSample", grid_size=0.05, mode="test",
                            keys=gs_keys, apply_to_pc=False,
                            return_grid_coord=True,
                        ),
                        crop=None,
                        post_transform=[
                            dict(type="CenterShift", apply_z=False),
                            dict(
                                type="Collect",
                                keys=("coord", "grid_coord", "index",
                                      "lang_feat", "valid_feat_mask"),
                                feat_keys=feat_keys,
                            ),
                        ],
                        aug_transform=[[]],
                    ),
                ),
            ),
            hooks=[
                dict(type="CheckpointLoader"),
                dict(type="IterationTimer"),
                dict(type="InformationWriter", log_interval=1),
                dict(
                    type="LangPretrainZeroShotSemSegEvalMulti",
                    class_names=[os.path.join(data_root, "labels.txt")],
                    text_embeddings=[os.path.join(data_root, "text_embeddings.npy")],
                    excluded_classes=[["wall", "floor"]],
                    vote_k=5,
                    confidence_threshold=0.0,
                ),
                dict(type="CheckpointSaver"),
            ],
            test=dict(
                type="ZeroShotSemSegTester",
                class_names=os.path.join(data_root, "labels.txt"),
                text_embeddings=os.path.join(data_root, "text_embeddings.npy"),
                excluded_classes=["wall", "floor"],
                vote_k=5,
                confidence_threshold=0.0,
                enable_voting=True,
            ),
        )
    )
    return cfg


def test_full_training_cycle(data_root, tmp_path):
    from scenesplat_tpu.engines.train import build_trainer

    save_path = str(tmp_path / "exp")
    cfg = make_cfg(data_root, save_path)
    trainer = build_trainer(cfg)
    trainer.train()

    # losses recorded and finite (mix_prob>0 halves steps: 4 scenes -> 1
    # step/epoch x 2 epochs)
    hist = trainer.storage.history("loss")
    assert hist._count >= 2
    assert np.isfinite(hist.latest())
    # eval hook ran and recorded a metric
    assert "current_metric_value" in trainer.comm_info
    # checkpoints exist
    assert os.path.isdir(os.path.join(save_path, "model", "model_last"))
    assert os.path.isdir(os.path.join(save_path, "model", "model_best"))
    assert os.path.isfile(os.path.join(save_path, "metrics.json"))

    # tester over fragments with the trained weights
    from scenesplat_tpu.engines.test import build_tester

    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    tester = build_tester(
        dict(cfg.test), trainer.model, variables, dict(cfg.data.test),
        patch_size=32,
    )
    results = tester.test()
    assert "mIoU" in results and np.isfinite(results["mIoU"])

    # resume path: start a fresh trainer from model_last
    cfg2 = make_cfg(data_root, save_path)
    cfg2["weight"] = os.path.join(save_path, "model", "model_last")
    cfg2["resume"] = True
    trainer2 = build_trainer(cfg2)
    trainer2.call_hooks("before_train")
    assert trainer2.start_epoch == 2
    assert int(trainer2.state.step) == int(trainer.state.step)


def test_resume_bit_exact(data_root, tmp_path):
    """Interrupted-and-resumed training reproduces the straight run exactly:
    data draws are (seed, epoch, index)-pure, per-step RNG folds on the
    global step, and the checkpoint restores the full train state."""
    import jax

    from scenesplat_tpu.engines.hooks.default import HookBase
    from scenesplat_tpu.engines.train import build_trainer

    # run A: 2 epochs straight
    cfg_a = make_cfg(data_root, str(tmp_path / "a"))
    tr_a = build_trainer(cfg_a)
    tr_a.train()
    params_a = jax.device_get(tr_a.state.params)

    # run B part 1: same config, interrupted after epoch 0 (the stopper runs
    # after CheckpointSaver, so model_last for epoch 0 is on disk)
    class _Interrupt(Exception):
        pass

    class _StopAfterFirstEpoch(HookBase):
        def after_epoch(self):
            if self.trainer.epoch == 0:
                raise _Interrupt

    save_b = str(tmp_path / "b")
    cfg_b = make_cfg(data_root, save_b)
    tr_b = build_trainer(cfg_b)
    stopper = _StopAfterFirstEpoch()
    stopper.trainer = tr_b
    tr_b.hooks.append(stopper)
    try:
        tr_b.train()
        raise AssertionError("interrupt hook did not fire")
    except _Interrupt:
        pass

    # run B part 2: resume from the interrupted checkpoint
    cfg_b2 = make_cfg(data_root, save_b)
    cfg_b2["weight"] = os.path.join(save_b, "model", "model_last")
    cfg_b2["resume"] = True
    tr_b2 = build_trainer(cfg_b2)
    tr_b2.train()
    assert int(tr_b2.state.step) == int(tr_a.state.step)
    params_b = jax.device_get(tr_b2.state.params)

    flat_a = jax.tree_util.tree_leaves_with_path(params_a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params_b))
    for path, leaf_a in flat_a:
        np.testing.assert_array_equal(
            leaf_a, flat_b[path], err_msg=jax.tree_util.keystr(path)
        )
