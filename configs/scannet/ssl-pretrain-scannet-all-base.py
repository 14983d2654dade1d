# SimDINO self-supervised pretraining on ScanNet 3DGS (no labels).
# Counterpart of reference configs/scannet/ssl-pretrain-scannet-all-base.py.
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "_base_"))
import gs_pipelines as _gp

_base_ = ["../_base_/default_runtime.py"]

data_root = os.environ.get("SCANNET_GS_ROOT", "data/scannet_gs")

batch_size = 24  # reference: 8/GPU x 3 GPUs
batch_size_val = 24
batch_size_test = 3
num_worker = 8
mix_prob = 0.0  # no mixup for SSL
clip_grad = 3.0
eval_epoch = 100
epoch = 8 * eval_epoch
evaluate = False
split_geometry = True

train = dict(type="DefaultSSLPreTrainer")

model = dict(
    type="DefaultContrastiverSimDinoV2",
    backbone_out_channels=512,
    local_crop_num=3,
    do_ema=True,
    do_ibot=True,
    enable_mae_loss=True,
    dino_weight=1.0,
    ibot_weight=1.0,
    mask_ratio_min_max=(0.1, 0.5),
    mask_sample_probability=0.5,
    mask_type="patch",
    mask_grid_size=0.2,
    backbone=dict(
        type="PT-v3m1",
        in_channels=11,
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
        pool_reduce="max",
        enable_mask_token=True,
        dtype="bfloat16",
    ),
)

optimizer = dict(type="AdamW", lr=0.001, weight_decay=0.001, eps=1e-4)
scheduler = dict(type="OneCycleLR", max_lr=[0.001, 0.0001], pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
param_dicts = [dict(keyword="block", lr=0.0001)]

data = dict(
    num_classes=200,
    ignore_index=-1,
    num_points=102400,        # per-crop global padding
    num_points_local=25600,   # per-crop local padding
    train=dict(
        type="GenericGSDataset",
        split="train",
        data_root=data_root,
        transform=_gp.ssl_train_transform(local_crop_num=3),
        test_mode=False,
    ),
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver", save_freq=None),
]
