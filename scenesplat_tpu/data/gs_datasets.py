"""3D-Gaussian-Splatting datasets.

Counterparts of the reference GS dataset family (pointcept/datasets/
scannetgs.py, scannetppgs.py, matterport3dgs.py, holicitygs.py,
kitti360_gs.py, generic_gs.py). Each scene is a folder of .npy assets with
3DGS attributes (xyz, color, wxyz quaternion, scale, opacity) plus optional
per-Gaussian SigLIP2 ``lang_feat``/``valid_feat_mask`` and labels.
"""

from __future__ import annotations

import numpy as np

from .defaults import DATASETS, DefaultDataset


class _GSDatasetBase(DefaultDataset):
    """Shared 3DGS attribute standardization (reference scannetgs.py:93-167)."""

    SCALE_CLIP = (0.0, 1.5)
    SEGMENT_KEYS = ("segment",)  # priority order; first found becomes 'segment'
    PC_SEGMENT_KEYS = ("pc_segment",)

    def standardize(self, data_dict):
        for key in ("coord", "pc_coord", "color", "normal", "quat", "sh"):
            if key in data_dict:
                data_dict[key] = data_dict[key].astype(np.float32)
        if "opacity" in data_dict:
            data_dict["opacity"] = (
                data_dict["opacity"].astype(np.float32).reshape(-1, 1)
            )
        if "scale" in data_dict:
            data_dict["scale"] = data_dict["scale"].astype(np.float32).clip(
                *self.SCALE_CLIP
            )
        if "lang_feat" in data_dict:
            data_dict["lang_feat"] = data_dict["lang_feat"].astype(np.float16)
        if "valid_feat_mask" in data_dict:
            data_dict["valid_feat_mask"] = data_dict["valid_feat_mask"].astype(bool)

        segment = None
        for key in self.SEGMENT_KEYS:
            if key in data_dict:
                segment = data_dict.pop(key).reshape(-1).astype(np.int32)
                break
        data_dict["segment"] = (
            segment
            if segment is not None
            else np.full(data_dict["coord"].shape[0], -1, dtype=np.int32)
        )
        for key in self.PC_SEGMENT_KEYS:
            if key in data_dict:
                data_dict["pc_segment"] = (
                    data_dict.pop(key).reshape(-1).astype(np.int32)
                )
                break
        if "instance" in data_dict:
            data_dict["instance"] = (
                data_dict.pop("instance").reshape(-1).astype(np.int32)
            )
        else:
            data_dict["instance"] = np.full(
                data_dict["coord"].shape[0], -1, dtype=np.int32
            )


@DATASETS.register_module()
class ScanNetGSDataset(_GSDatasetBase):
    VALID_ASSETS = [
        "coord", "color", "normal", "segment20", "instance", "quat", "scale",
        "opacity", "lang_feat", "valid_feat_mask", "pc_instance",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment20"]
    SEGMENT_KEYS = ("segment20", "segment200", "segment")
    PC_SEGMENT_KEYS = ("pc_segment20", "pc_segment200", "pc_segment")
    # ScanNet-20 benchmark ids for submission writers
    class2id = np.array(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
    )


@DATASETS.register_module()
class ScanNet200GSDataset(ScanNetGSDataset):
    VALID_ASSETS = [
        "coord", "color", "normal", "segment200", "instance", "quat", "scale",
        "opacity", "lang_feat", "valid_feat_mask", "pc_instance",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment200"]
    SEGMENT_KEYS = ("segment200", "segment20", "segment")
    PC_SEGMENT_KEYS = ("pc_segment200", "pc_segment20", "pc_segment")

    @property
    def class2id(self):
        # ScanNet200 benchmark ids (packaged scannet200_constants table)
        from scenesplat_tpu.data import metadata

        return metadata.scannet_class_ids(200)


@DATASETS.register_module()
class ScanNetPPGSDataset(_GSDatasetBase):
    VALID_ASSETS = [
        "coord", "color", "normal", "segment", "instance", "quat", "scale",
        "opacity", "lang_feat", "valid_feat_mask",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment"]


@DATASETS.register_module()
class Matterport3DGSDataset(_GSDatasetBase):
    VALID_ASSETS = [
        "coord", "color", "normal", "segment", "instance", "quat", "scale",
        "opacity", "lang_feat", "valid_feat_mask",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment"]


@DATASETS.register_module()
class Matterport3D_160_GSDataset(Matterport3DGSDataset):
    # "segment_nyu_160" is the reference preprocessor's on-disk name
    # (preprocess_matterport3d_gs.py:291, matterport3dgs.py:102-105);
    # "segment160" is accepted as a shorthand alias
    VALID_ASSETS = [
        "coord", "color", "normal", "segment160", "segment_nyu_160", "segment",
        "instance", "quat", "scale", "opacity", "lang_feat", "valid_feat_mask",
    ]
    EVAL_PC_ASSETS = [
        "pc_coord", "pc_segment160", "pc_segment_nyu_160", "pc_segment",
    ]
    SEGMENT_KEYS = ("segment160", "segment_nyu_160", "segment")
    PC_SEGMENT_KEYS = ("pc_segment160", "pc_segment_nyu_160", "pc_segment")


@DATASETS.register_module()
class HoliCityGSDataset(_GSDatasetBase):
    VALID_ASSETS = [
        "coord", "color", "segment", "quat", "scale", "opacity",
        "lang_feat", "valid_feat_mask",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment"]


@DATASETS.register_module()
class KITTI360GSDataset(_GSDatasetBase):
    VALID_ASSETS = [
        "coord", "color", "segment", "quat", "scale", "opacity",
        "lang_feat", "valid_feat_mask",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment"]


@DATASETS.register_module()
class GenericGSDataset(_GSDatasetBase):
    """Unlabeled / custom 3DGS scenes (reference generic_gs.py:11-85):
    opacity clipped to >= 1e-3, scale clipped to [1e-4, 1]."""

    VALID_ASSETS = [
        "coord", "color", "normal", "segment", "instance", "quat", "scale",
        "opacity", "lang_feat", "valid_feat_mask",
    ]
    EVAL_PC_ASSETS = ["pc_coord", "pc_segment"]
    SCALE_CLIP = (1e-4, 1.0)

    def standardize(self, data_dict):
        super().standardize(data_dict)
        if "opacity" in data_dict:
            data_dict["opacity"] = np.clip(data_dict["opacity"], 1e-3, None)
