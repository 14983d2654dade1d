# Supervised semantic segmentation on ScanNet-20 3DGS (fixed-xyz splats with
# normals). Counterpart of reference configs/scannet/
# semseg-gs-scannet-all-w-normal-fixed-xyz.py.
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "_base_"))
import gs_pipelines as _gp

_base_ = ["../_base_/default_runtime.py"]

data_root = os.environ.get("SCANNET_GS_ROOT", "data/scannet_gs")

batch_size = 48  # reference: 12/GPU x 4 GPUs
batch_size_val = 4
batch_size_test = 4
num_worker = 8
mix_prob = 0.8
clip_grad = 1.0
eval_epoch = 100
epoch = 8 * eval_epoch
evaluate = True
split_geometry = True

_feat_keys = ("color", "opacity", "quat", "scale", "normal")

model = dict(
    type="DefaultSegmentorV2",
    num_classes=20,
    backbone_out_channels=64,
    backbone=dict(
        type="PT-v3m1",
        in_channels=14,  # color 3 + quat 4 + scale 3 + opacity 1 + normal 3
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        pre_norm=True,
        upcast_softmax=False,
        serialization_depth=10,
        stage_capacity=(0.5, 0.25, 0.125, 0.0625),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
)

optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(type="OneCycleLR", max_lr=[0.006, 0.0006], pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
param_dicts = [dict(keyword="block", lr=0.0006)]

_gs_keys = ("coord", "color", "opacity", "quat", "scale", "segment", "normal")
_test_transform, _test_cfg = _gp.semseg_test_transform_and_cfg(
    _gs_keys, _feat_keys)

data = dict(
    num_classes=20,
    ignore_index=-1,
    num_points=205824,  # 204800 crop padded to a multiple of patch 1024
    train=dict(
        type="ScanNetGSDataset",
        split="train",
        data_root=data_root,
        transform=_gp.semseg_train_transform(_gs_keys, _feat_keys),
        test_mode=False,
    ),
    val=dict(
        type="ScanNetGSDataset",
        split="val",
        data_root=data_root,
        transform=_gp.semseg_val_transform(_gs_keys, _feat_keys),
        test_mode=False,
    ),
    test=dict(
        type="ScanNetGSDataset",
        split="val",
        data_root=data_root,
        transform=_test_transform,
        test_mode=True,
        test_cfg=_test_cfg,
    ),
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator", ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
    dict(type="PreciseEvaluator", test_last=False),
]

test = dict(type="SemSegTester", num_classes=20, ignore_index=-1)
