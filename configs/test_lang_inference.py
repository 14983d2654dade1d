# Single-scene zero-shot inference config for a pretrained LangPretrainer
# checkpoint (used by test_single_scene_lang.py and tools/test.py).
# Counterpart of reference configs/test_lang_inference.py.
import os

_base_ = ["_base_/default_runtime.py"]

meta_root = os.environ.get("SCENESPLAT_META_ROOT", "data/metadata")

batch_size = 1
batch_size_val = 1
batch_size_test = 1
num_worker = 4
split_geometry = True

model = dict(
    type="LangPretrainer",
    backbone=dict(
        type="PT-v3m1",
        in_channels=11,  # color 3 + quat 4 + scale 3 + opacity 1
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
)

data = dict(
    num_classes=200,
    ignore_index=-1,
    num_points=196608,
)

test = dict(
    type="ZeroShotSemSegTester",
    class_names=f"{meta_root}/scannet200_labels.txt",
    text_embeddings=f"{meta_root}/scannet200_text_embeddings_siglip2.pt",
    excluded_classes=["wall", "floor", "ceiling"],
    enable_voting=True,
    vote_k=25,
    confidence_threshold=0.1,
)
