# Flagship VL pretraining config: PT-v3m1 LangPretrainer over concatenated
# 3DGS datasets (counterpart of reference configs/concat_dataset/
# lang-pretrain-concat-scan-ppv2-matt-mcmc-wo-normal-contrastive.py).
import os

_base_ = ["../_base_/default_runtime.py"]

# data roots from environment (override with --options *_data_root=...)
scannet_data_root = os.environ.get("SCANNET_GS_ROOT", "data/scannet_gs")
scannetpp_data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")
matterport3d_data_root = os.environ.get("MATTERPORT3D_GS_ROOT", "data/matterport3d_gs")

meta_root = os.environ.get("SCENESPLAT_META_ROOT", "data/metadata")

batch_size = 8  # global batch over the data mesh (reference: 2/GPU x 16 GPU)
num_worker = 8
mix_prob = 0.8
clip_grad = 1.0
epoch = 600
evaluate = True
# build serialization + conv/pooling plans in separate jitted programs and
# feed them into the fwd+bwd program: at 192k-point scenes the fused compile
# exceeds the remote compile helper's memory cap (CLAUDE.md round-1 notes)
split_geometry = True

model = dict(
    type="LangPretrainer",
    backbone=dict(
        type="PT-v3m1",
        in_channels=11,  # color 3 + quat 4 + scale 3 + opacity 1 (w/o normal)
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2),
        enc_depths=(2, 2, 2, 6),
        enc_channels=(32, 64, 128, 256),
        enc_num_head=(2, 4, 8, 16),
        enc_patch_size=(1024, 1024, 1024, 1024),
        dec_depths=(2, 2, 2),
        dec_channels=(768, 512, 256),
        dec_num_head=(16, 16, 16),
        mlp_ratio=4,
        qkv_bias=True,
        drop_path=0.3,
        shuffle_orders=True,
        pre_norm=True,
        upcast_softmax=False,
        serialization_depth=10,  # 6x6 m chunks at 2 cm; packed code fast path
        stage_capacity=(0.5, 0.25, 0.125),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CosineSimilarity", reduction="mean", loss_weight=1.0),
        dict(type="L2Loss", reduction="mean", loss_weight=1.0),
        dict(
            type="AggregatedContrastiveLoss",
            temperature=0.2,
            reduction="mean",
            loss_weight=0.02,
            schedule="last_75",
            num_classes=256,
        ),
    ],
)

optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    type="OneCycleLR",
    max_lr=[0.006, 0.0006],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0006)]

feat_keys = ("color", "opacity", "quat", "scale")
grid_sample_keys = (
    "coord", "color", "opacity", "quat", "scale", "segment",
    "lang_feat", "valid_feat_mask",
)

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=0.2),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.01),
    dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(
        type="GridSample",
        grid_size=0.02,
        hash_type="fnv",
        mode="train",
        keys=grid_sample_keys,
        return_grid_coord=True,
    ),
    dict(type="SphereCrop", point_max=192000, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
    dict(
        type="Collect",
        keys=("coord", "grid_coord", "segment", "lang_feat", "valid_feat_mask"),
        feat_keys=feat_keys,
    ),
    # stem k=5 conv plan built by the loader workers (overlaps the device;
    # ~71 ms/fwd of device plan-gather time at 32k, and the only viable k=5
    # path at scene extents where the on-device join no longer compiles).
    # extent = the serialization_depth=10 coordinate bound.
    dict(type="HostConvPlan", kernel_size=5, extent=(1024, 1024, 1024)),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(
        type="GridSample",
        grid_size=0.02,
        hash_type="fnv",
        mode="train",
        keys=grid_sample_keys,
        return_grid_coord=True,
    ),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
    dict(
        type="Collect",
        keys=(
            "coord", "grid_coord", "segment", "lang_feat", "valid_feat_mask",
            "pc_coord", "pc_segment",
        ),
        feat_keys=feat_keys,
    ),
]

train = dict(type="MultiDatasetTrainer")

data = dict(
    num_classes=100,
    ignore_index=-1,
    num_points=196608,  # 192k padded to a multiple of patch 1024
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(
                type="Matterport3D_160_GSDataset",
                split=(
                    "train_grid1.0cm_chunk6x6_stride3x3_filtered",
                    "val_grid1.0cm_chunk6x6_stride3x3_filtered",
                ),
                data_root=matterport3d_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=3,
            ),
            dict(
                type="ScanNetPPGSDataset",
                split=(
                    "train_grid1.0cm_chunk6x6_stride3x3",
                    "test_grid1.0cm_chunk6x6_stride3x3",
                ),
                data_root=scannetpp_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=2,
            ),
            dict(
                type="ScanNet200GSDataset",
                split=(
                    "train_grid1.0cm_chunk6x6_stride3x3",
                    "test_grid1.0cm_chunk6x6_stride3x3",
                ),
                data_root=scannet_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=2,
            ),
        ],
    ),
    val=[
        dict(
            type="ScanNetPPGSDataset",
            split="val",
            data_root=scannetpp_data_root,
            is_train=False,
            transform=_val_transform,
            test_mode=False,
        ),
        dict(
            type="ScanNet200GSDataset",
            split="val",
            data_root=scannet_data_root,
            is_train=False,
            transform=_val_transform,
            test_mode=False,
        ),
        dict(
            type="Matterport3D_160_GSDataset",
            split="test_grid1.0cm_chunk6x6_stride3x3_filtered",
            data_root=matterport3d_data_root,
            is_train=False,
            transform=_val_transform,
            test_mode=False,
        ),
    ],
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(
        type="LangPretrainZeroShotSemSegEvalMulti",
        class_names=[
            f"{meta_root}/scannetpp_top100_labels.txt",
            f"{meta_root}/scannet200_labels.txt",
            f"{meta_root}/matterport_nyu160_labels.txt",
        ],
        text_embeddings=[
            f"{meta_root}/scannetpp_top100_text_embeddings_siglip2.pt",
            f"{meta_root}/scannet200_text_embeddings_siglip2.pt",
            f"{meta_root}/matterport-nyu160_text_embeddings_siglip2.pt",
        ],
        excluded_classes=[
            ["wall", "floor", "ceiling"],
            ["wall", "floor", "ceiling"],
            ["wall", "floor", "ceiling", "other furniture"],
        ],
        ignore_index=-1,
        vote_k=25,
        enable_voting=True,
        confidence_threshold=0.1,
    ),
    dict(type="CheckpointSaver", save_freq=None),
    dict(type="PreciseEvaluator", test_last=False),
]
