# SimDINO SSL pretraining over six concatenated unlabeled 3DGS corpora
# (ScanNet++ v2, ScanNet, 3RScan, ARKitScenes, Hypersim, Matterport3D — all
# loaded through GenericGSDataset). Counterpart of reference
# configs/concat_dataset/ssl-pretrain-concat-scan-ppv2-matt-3rscan-arkit-hyper-mcmc-base.py.
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "_base_"))
import gs_pipelines as _gp

_base_ = ["../scannet/ssl-pretrain-scannet-all-base.py"]

scannetpp_data_root = os.environ.get("SCANNETPP_GS_ROOT", "data/scannetpp_gs")
scannet_data_root = os.environ.get("SCANNET_GS_ROOT", "data/scannet_gs")
threerscan_data_root = os.environ.get("THREERSCAN_GS_ROOT", "data/3rscan_gs")
arkit_data_root = os.environ.get("ARKITSCENES_GS_ROOT", "data/arkitscenes_gs")
hypersim_data_root = os.environ.get("HYPERSIM_GS_ROOT", "data/hypersim_gs")
matterport3d_data_root = os.environ.get("MATTERPORT3D_GS_ROOT",
                                        "data/matterport3d_gs")

# larger crops than the single-dataset run (reference l.139-159:
# SphereCropRandomMaxPoints point_max=256000)
_transform = _gp.ssl_train_transform(local_crop_num=3,
                                     crop_point_max=256000)

_dataset = dict(
    type="GenericGSDataset",
    split="train",
    transform=_transform,
    test_mode=False,
    loop=1,
)

data = dict(
    train=dict(
        _delete_=True,
        type="ConcatDataset",
        datasets=[
            dict(_dataset, data_root=scannetpp_data_root),
            dict(_dataset, data_root=scannet_data_root),
            dict(_dataset, data_root=threerscan_data_root),
            dict(_dataset, data_root=arkit_data_root),
            dict(_dataset, data_root=hypersim_data_root),
            dict(_dataset, data_root=matterport3d_data_root),
        ],
    ),
)
