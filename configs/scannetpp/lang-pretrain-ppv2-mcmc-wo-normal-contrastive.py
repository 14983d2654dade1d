# VL pretraining on ScanNet++ v2 3DGS (fixed-xyz splats, with normals).
# Counterpart of reference configs/scannetpp/
# lang-pretrain-ppv2-mcmc-wo-normal-contrastive.py (zero-shot eval runs
# cross-dataset on the ScanNet fixed-xyz val split, as the reference does).
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "_base_"))
import gs_pipelines as _gp

_base_ = ["../_base_/default_runtime.py",
          "../_base_/dataset/scannetpp.py"]

data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")
meta_root = os.environ.get("SCENESPLAT_META_ROOT", "data/metadata")
class_names_path = f"{meta_root}/scannet200_labels.txt"
text_embeddings_path = f"{meta_root}/scannet200_text_embeddings_siglip2.pt"

batch_size = 8  # reference: 2/GPU x 4 GPUs
batch_size_val = 8
batch_size_test = 4
num_worker = 8
mix_prob = 0.8
clip_grad = 1.0
epoch = 800
evaluate = True
split_geometry = True

_feat_keys = ("color", "opacity", "quat", "scale", "normal")

model = dict(
    type="LangPretrainer",
    backbone=dict(
        type="PT-v3m1",
        in_channels=14,  # color 3 + quat 4 + scale 3 + opacity 1 + normal 3
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
        serialization_depth=10,
        stage_capacity=(0.5, 0.25, 0.125),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CosineSimilarity", reduction="mean", loss_weight=1.0),
        dict(type="L2Loss", reduction="mean", loss_weight=1.0),
        dict(type="AggregatedContrastiveLoss", temperature=0.2,
             reduction="mean", loss_weight=0.020, schedule="last_75",
             num_classes=256),
    ],
)

optimizer = dict(type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(type="OneCycleLR", max_lr=[0.006, 0.0006], pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
param_dicts = [dict(keyword="block", lr=0.0006)]

_gs_keys = ("coord", "color", "opacity", "quat", "scale", "normal", "segment",
            "lang_feat", "valid_feat_mask")
_test_transform, _test_cfg = _gp.lang_test_transform_and_cfg(
    _gs_keys, feat_keys=_feat_keys)

data = dict(
    num_classes=100,
    ignore_index=-1,
    num_points=196608,
    train=dict(
        type="ScanNetPPGSDataset",
        split=("train_grid1mm_chunk6x6_stride3x3",
               "test_grid1mm_chunk6x6_stride3x3",
               "train_scannet_fix_xyz"),
        data_root=data_root,
        transform=_gp.lang_train_transform(_gs_keys, feat_keys=_feat_keys),
        test_mode=False,
    ),
    val=dict(
        type="ScanNetPPGSDataset",
        split="val_scannet_fix_xyz",
        data_root=data_root,
        transform=_gp.lang_val_transform(_gs_keys, feat_keys=_feat_keys),
        test_mode=False,
    ),
    test=dict(
        type="ScanNetPPGSDataset",
        split="val_selected_10",
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
    dict(
        type="LangPretrainZeroShotSemSegEval",
        class_names=class_names_path,
        text_embeddings=text_embeddings_path,
        excluded_classes=["wall", "floor", "ceiling"],
        ignore_index=-1,
        vote_k=25,
        enable_voting=True,
        confidence_threshold=0.1,
    ),
    dict(type="CheckpointSaver", save_freq=None),
    dict(type="BeginningEvaluator", test_last=True),
]

test = dict(
    type="ZeroShotSemSegTester",
    class_names=class_names_path,
    text_embeddings=text_embeddings_path,
    excluded_classes=["wall", "floor", "ceiling"],
    enable_voting=True,
    vote_k=25,
    confidence_threshold=0.1,
)
