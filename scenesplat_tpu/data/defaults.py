"""Datasets: scene-folder .npy loading + transform pipelines.

Re-implementation of the reference dataset layer
(pointcept/datasets/defaults.py:16-235) without torch: datasets are plain
indexable objects; batching/padding happens in data.collate and the loader.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Sequence
from copy import deepcopy
from typing import Optional

import numpy as np

from scenesplat_tpu.utils.logger import get_root_logger
from scenesplat_tpu.utils.registry import Registry
from .transforms import Compose, TRANSFORMS

DATASETS = Registry("datasets")


def build_dataset(cfg, **kwargs):
    return DATASETS.build(cfg, **kwargs)


@DATASETS.register_module()
class DefaultDataset:
    VALID_ASSETS = [
        "coord",
        "color",
        "normal",
        "strength",
        "segment",
        "instance",
        "pose",
    ]
    EVAL_PC_ASSETS: list = []

    def __init__(
        self,
        split="train",
        data_root="data/dataset",
        transform=None,
        test_mode=False,
        test_cfg=None,
        cache=False,
        ignore_index=-1,
        loop=1,
        sample_tail_classes=False,
        filtered_scene=None,
        is_train=True,
    ):
        self.data_root = data_root
        self.split = split
        self.transform = Compose(transform)
        self.cache = cache
        self.ignore_index = ignore_index
        self.loop = loop if not test_mode else 1
        self.test_mode = test_mode
        self.test_cfg = test_cfg if test_mode else None
        self.sample_tail = sample_tail_classes
        self.is_train = is_train

        if test_mode:
            self.test_voxelize = (
                TRANSFORMS.build(dict(self.test_cfg["voxelize"]))
                if self.test_cfg.get("voxelize")
                else None
            )
            self.test_crop = (
                TRANSFORMS.build(dict(self.test_cfg["crop"]))
                if self.test_cfg.get("crop")
                else None
            )
            self.post_transform = Compose(self.test_cfg.get("post_transform"))
            self.aug_transform = [
                Compose(aug) for aug in self.test_cfg.get("aug_transform", [[]])
            ]

        self.data_list = self.get_data_list(filtered_scene=filtered_scene)
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in {split} set."
        )

    # ---- listing ---------------------------------------------------------
    def get_data_list(self, filtered_scene=None):
        if isinstance(self.split, str):
            data_list = sorted(glob.glob(os.path.join(self.data_root, self.split, "*")))
        elif isinstance(self.split, Sequence):
            data_list = []
            for split in self.split:
                data_list += sorted(glob.glob(os.path.join(self.data_root, split, "*")))
        else:
            raise NotImplementedError
        if filtered_scene is not None:
            data_list = [
                d
                for d in data_list
                if os.path.basename(d).split("_")[0] not in filtered_scene
            ]
        return data_list

    def get_data_name(self, idx):
        return os.path.basename(self.data_list[idx % len(self.data_list)])

    # ---- loading ---------------------------------------------------------
    def load_assets(self, data_path):
        data_dict = {}
        for asset in sorted(os.listdir(data_path)):
            if not asset.endswith(".npy"):
                continue
            key = asset[:-4]
            if self.is_train:
                if key not in self.VALID_ASSETS:
                    continue
            elif key not in self.VALID_ASSETS and key not in self.EVAL_PC_ASSETS:
                continue
            try:
                data_dict[key] = np.load(os.path.join(data_path, asset))
            except Exception as e:  # annotate the failing scene (reference
                # scannetgs.py:82-90)
                raise RuntimeError(
                    f"failed np.load {os.path.join(data_path, asset)}: {e}"
                ) from e
        return data_dict

    def get_data(self, idx):
        data_path = self.data_list[idx % len(self.data_list)]
        data_dict = self.load_assets(data_path)
        data_dict["name"] = self.get_data_name(idx)
        self.standardize(data_dict)
        return data_dict

    def standardize(self, data_dict):
        if "coord" in data_dict:
            data_dict["coord"] = data_dict["coord"].astype(np.float32)
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"].astype(np.float32)
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"].astype(np.float32)
        if "segment" in data_dict:
            data_dict["segment"] = data_dict["segment"].reshape(-1).astype(np.int32)
        else:
            data_dict["segment"] = np.full(
                data_dict["coord"].shape[0], -1, dtype=np.int32
            )
        if "instance" in data_dict:
            data_dict["instance"] = data_dict["instance"].reshape(-1).astype(np.int32)
        else:
            data_dict["instance"] = np.full(
                data_dict["coord"].shape[0], -1, dtype=np.int32
            )

    # ---- item protocol -----------------------------------------------------
    def prepare_train_data(self, idx):
        return self.transform(self.get_data(idx))

    def prepare_test_data(self, idx):
        """Fragmented test item: TTA augs x complementary voxel fragments
        (reference defaults.py:136-183)."""
        data_dict = self.transform(self.get_data(idx))
        result_dict = dict(
            segment=data_dict.pop("segment", None),
            name=data_dict.pop("name", None),
        )
        for key in (
            "coord",
            "pc_coord",
            "pc_segment",
            "origin_coord",
            "origin_feat_mask",
            "origin_instance",
        ):
            if key in data_dict:
                result_dict[key] = (
                    data_dict.pop(key) if key.startswith("origin_") else data_dict[key]
                )
        if "origin_segment" in data_dict:
            assert "inverse" in data_dict
            result_dict["origin_segment"] = data_dict.pop("origin_segment")
            result_dict["inverse"] = data_dict.pop("inverse")

        fragment_list = []
        for aug in self.aug_transform:
            data = aug(deepcopy(data_dict))
            if self.test_voxelize is not None:
                data_part_list = self.test_voxelize(data)
            else:
                data["index"] = np.arange(data["coord"].shape[0])
                data_part_list = [data]
            for data_part in data_part_list:
                parts = (
                    self.test_crop(data_part) if self.test_crop else [data_part]
                )
                fragment_list += parts
        result_dict["fragment_list"] = [
            self.post_transform(frag) for frag in fragment_list
        ]
        return result_dict

    def __getitem__(self, idx):
        if self.test_mode:
            return self.prepare_test_data(idx)
        return self.prepare_train_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop


@DATASETS.register_module()
class ConcatDataset:
    """Flat index over child datasets (reference defaults.py:196-235)."""

    def __init__(self, datasets, loop=1):
        self.datasets = [build_dataset(dict(d)) for d in datasets]
        self.loop = loop
        self.data_list = []
        for i, ds in enumerate(self.datasets):
            self.data_list += [(i, j) for j in range(len(ds))]
        get_root_logger().info(
            f"Totally {len(self.data_list)} x {self.loop} samples in the concat set."
        )

    def get_data(self, idx):
        dataset_idx, data_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[dataset_idx][data_idx]

    def get_data_name(self, idx):
        dataset_idx, data_idx = self.data_list[idx % len(self.data_list)]
        return self.datasets[dataset_idx].get_data_name(data_idx)

    def __getitem__(self, idx):
        return self.get_data(idx)

    def __len__(self):
        return len(self.data_list) * self.loop
