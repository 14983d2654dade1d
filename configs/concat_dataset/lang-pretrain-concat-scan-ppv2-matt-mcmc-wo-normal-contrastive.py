# The FLAGSHIP VL-pretraining config: ScanNet-200 + ScanNet++ v2 +
# Matterport3D-160 joint training (Matterport as the main dataset, loop 3
# vs 2/2). Counterpart of reference configs/concat_dataset/
# lang-pretrain-concat-scan-ppv2-matt-mcmc-wo-normal-contrastive.py
# (weight_pdnorm l.104-108, eval hook l.116-141).
import os
import sys

_base_ = ["lang-pretrain-concat-scan-ppv2-mcmc-wo-normal-contrastive.py"]

meta_root = os.environ.get("SCENESPLAT_META_ROOT", "data/metadata")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "_base_"))
import gs_pipelines as _gp

scannet_data_root = os.environ.get("SCANNET_GS_ROOT", "data/scannet_gs")
scannetpp_data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")
matterport3d_data_root = os.environ.get("MATTERPORT3D_GS_ROOT",
                                        "data/matterport3d_gs")

_gs_keys = ("coord", "color", "opacity", "quat", "scale", "segment",
            "lang_feat", "valid_feat_mask")
_train_transform = _gp.lang_train_transform(_gs_keys)
_val_transform = _gp.lang_val_transform(_gs_keys)

# MA3D as the main dataset (reference l.104-108)
weight = {"Matterport3DGS": 3, "ScanNetPPGS": 2, "ScanNetGS": 2}

data = dict(
    train=dict(
        _delete_=True,
        type="ConcatDataset",
        datasets=[
            dict(
                type="Matterport3D_160_GSDataset",
                split=("train_grid1.0cm_chunk6x6_stride3x3_filtered",
                       "val_grid1.0cm_chunk6x6_stride3x3_filtered"),
                data_root=matterport3d_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=weight["Matterport3DGS"],
            ),
            dict(
                type="ScanNetPPGSDataset",
                split=("train_grid1.0cm_chunk6x6_stride3x3",
                       "test_grid1.0cm_chunk6x6_stride3x3"),
                data_root=scannetpp_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=weight["ScanNetPPGS"],
            ),
            dict(
                type="ScanNet200GSDataset",
                split=("train_grid1.0cm_chunk6x6_stride3x3",
                       "test_grid1.0cm_chunk6x6_stride3x3"),
                data_root=scannet_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=weight["ScanNetGS"],
            ),
        ],
    ),
    val=[
        dict(type="ScanNetPPGSDataset", split="val",
             data_root=scannetpp_data_root, transform=_val_transform,
             test_mode=False),
        dict(type="ScanNet200GSDataset", split="val",
             data_root=scannet_data_root, transform=_val_transform,
             test_mode=False),
        dict(type="Matterport3D_160_GSDataset",
             split="test_grid1.0cm_chunk6x6_stride3x3_filtered",
             data_root=matterport3d_data_root, transform=_val_transform,
             test_mode=False),
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
