# VL pretraining over ScanNet-200 + ScanNet++ v2 (the flagship config minus
# Matterport3D). Counterpart of reference configs/concat_dataset/
# lang-pretrain-concat-scan-ppv2-mcmc-wo-normal-contrastive.py.
import os
import sys

_base_ = ["lang-pretrain-concat-gs-contrastive.py",
          "../_base_/dataset/scannetpp.py"]

meta_root = os.environ.get("SCENESPLAT_META_ROOT", "data/metadata")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "_base_"))
import gs_pipelines as _gp

scannet_data_root = os.environ.get("SCANNET_GS_ROOT", "data/scannet_gs")
scannetpp_data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")

_gs_keys = ("coord", "color", "opacity", "quat", "scale", "segment",
            "lang_feat", "valid_feat_mask")
_train_transform = _gp.lang_train_transform(_gs_keys)
_val_transform = _gp.lang_val_transform(_gs_keys)

data = dict(
    train=dict(
        _delete_=True,
        type="ConcatDataset",
        datasets=[
            dict(
                type="ScanNetPPGSDataset",
                split=("train_grid1.0cm_chunk6x6_stride3x3",
                       "test_grid1.0cm_chunk6x6_stride3x3"),
                data_root=scannetpp_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=2,
            ),
            dict(
                type="ScanNet200GSDataset",
                split=("train_grid1.0cm_chunk6x6_stride3x3",
                       "test_grid1.0cm_chunk6x6_stride3x3"),
                data_root=scannet_data_root,
                transform=_train_transform,
                test_mode=False,
                loop=2,
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
        ],
        text_embeddings=[
            f"{meta_root}/scannetpp_top100_text_embeddings_siglip2.pt",
            f"{meta_root}/scannet200_text_embeddings_siglip2.pt",
        ],
        excluded_classes=[
            ["wall", "floor", "ceiling"],
            ["wall", "floor", "ceiling"],
        ],
        ignore_index=-1,
        vote_k=25,
        enable_voting=True,
        confidence_threshold=0.1,
    ),
    dict(type="CheckpointSaver", save_freq=None),
    dict(type="PreciseEvaluator", test_last=False),
]
