"""Fixed-shape padded collation.

Replaces the reference's ragged offset-concat collate
(pointcept/datasets/utils.py:8-48). Each sample is padded to a static bucket
size so the jitted train step sees one shape; padding slots are masked.

Mix3D batch mixing (reference point_collate_fn:37-48 merges consecutive
sample pairs with probability ``mix_prob``) is implemented at collate time:
a mixed pair's valid points are concatenated into one slot (random-subsampled
if they exceed the bucket), the partner slot is dropped, keeping shapes
static. Deviation from the reference (which lets mixed clouds grow to 2x) is
bounded by the bucket size and documented here.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from scenesplat_tpu.data.transforms import trng

PAD_VALUES = {
    "segment": -1,
    "instance": -1,
    "pc_segment": -1,
}

INT_KEYS = ("segment", "instance", "grid_coord", "index", "pc_segment",
            "stem_nbr")
BOOL_KEYS = ("valid_feat_mask", "stem_valid")

# Host-built conv-plan keys (transforms.HostConvPlan) hold WITHIN-SAMPLE
# point indices: padding appends (indices stay valid), but Mix3D merges and
# over-budget downsampling reindex points, so those paths drop the keys and
# the trainer rebuilds the plan on device for the batch.
PLAN_KEYS = ("stem_nbr", "stem_valid")


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pick_bucket(n: int, patch_size: int, buckets: Optional[Sequence[int]] = None) -> int:
    if buckets:
        for b in sorted(buckets):
            if n <= b:
                return b
        return max(buckets)
    return max(patch_size, _round_up(n, patch_size))


def pad_sample(sample: Dict[str, np.ndarray], target_n: int) -> Dict[str, np.ndarray]:
    """Pad every per-point array of one sample dict to target_n rows and add
    'mask'. Scalar / full-res (pc_*, origin_*) keys pass through."""
    n = sample["coord"].shape[0]
    out = {}
    if n > target_n:
        keep = trng().choice(n, target_n, replace=False)
        sample = {
            k: (v[keep] if isinstance(v, np.ndarray) and v.shape[:1] == (n,) and not k.startswith(("pc_", "origin_")) else v)
            for k, v in sample.items()
        }
        n = target_n
    pad = target_n - n
    for key, value in sample.items():
        if (
            isinstance(value, np.ndarray)
            and value.shape[:1] == (n,)
            and not key.startswith(("pc_", "origin_"))
        ):
            if pad:
                fill = PAD_VALUES.get(key, 0)
                width = [(0, pad)] + [(0, 0)] * (value.ndim - 1)
                value = np.pad(value, width, constant_values=fill)
            out[key] = value
        else:
            out[key] = value
    mask = np.zeros(target_n, bool)
    mask[:n] = True
    out["mask"] = mask
    return out


def _merge_two(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    na, nb = a["coord"].shape[0], b["coord"].shape[0]
    merged = {}
    for key in a:
        va = a[key]
        if (
            isinstance(va, np.ndarray)
            and va.shape[:1] == (na,)
            and key in b
            and isinstance(b[key], np.ndarray)
            and b[key].shape[:1] == (nb,)
            and not key.startswith(("pc_", "origin_"))
        ):
            merged[key] = np.concatenate([va, b[key]], axis=0)
        else:
            merged[key] = va
    for key in PLAN_KEYS:  # merged scenes need a fresh plan (cross-scene
        merged.pop(key, None)  # neighbors appear in the shared space)
    return merged


def collate_padded(
    samples: List[Dict[str, np.ndarray]],
    num_points: int,
    mix_prob: float = 0.0,
    cast_dtypes: bool = True,
) -> Dict[str, np.ndarray]:
    """Collate sample dicts to a dict of [B, num_points, ...] arrays + mask.

    With mix_prob > 0 the loader supplies 2B samples; slot i keeps sample 2i
    and, with probability mix_prob, merges sample 2i+1 into it. Unlike the
    reference (which merges offset pairs and halves the logical batch,
    datasets/utils.py:37-48), the batch dimension stays static for jit.
    """
    if mix_prob > 0 and len(samples) > 1:
        mixed = []
        it = iter(samples)
        for a in it:
            b = next(it, None)
            if b is not None and trng().random() < mix_prob:
                mixed.append(_merge_two(a, b))
            else:
                mixed.append(a)
        samples = mixed

    # over-budget samples random-downsample (same draw order as pad_sample)
    shrunk = []
    for s in samples:
        n = s["coord"].shape[0]
        if n > num_points:
            keep = trng().choice(n, num_points, replace=False)
            s = {
                k: (v[keep]
                    if isinstance(v, np.ndarray) and v.shape[:1] == (n,)
                    and not k.startswith(("pc_", "origin_"))
                    else v)
                for k, v in s.items()
                if k not in PLAN_KEYS  # indices go stale under reindexing
            }
        shrunk.append(s)
    samples = shrunk

    keys = set(samples[0])
    for s in samples[1:]:
        keys &= set(s)
    b = len(samples)
    lengths = [s["coord"].shape[0] for s in samples]
    batch = {}
    for key in keys:
        vals = [s[key] for s in samples]
        if key == "cls_token":
            # per-scene shape category (PartSeg): scalar or 1-elem array
            batch[key] = np.asarray(
                [int(np.asarray(v).reshape(-1)[0]) for v in vals], np.int32
            )
            continue
        if not isinstance(vals[0], np.ndarray):
            if isinstance(vals[0], (int, float)):
                batch[key] = np.asarray(vals)
            continue
        if any(v.shape[:1] != (n,) for v, n in zip(vals, lengths)) or (
            key.startswith(("pc_", "origin_"))
        ):
            continue  # per-scene full-res arrays don't batch to fixed shape
        # one write per sample into the final [B, num_points, ...] buffer
        # (pad + stack + dtype-cast as separate passes costs 3 copies;
        # lang_feat at [2, 192k, 768] made collate slower than the model)
        dtype = vals[0].dtype
        if cast_dtypes:
            if key in INT_KEYS:
                dtype = np.int32
            elif key in BOOL_KEYS or dtype == bool:
                dtype = np.dtype(bool)
            elif dtype == np.float16:
                # deliberate half-precision storage (SigLIP2 lang_feat,
                # gs_datasets.py:37) ships to the device as-is — the f16->f32
                # upcast is exact and free on device, but costs a 1.2 GB host
                # write + 2x H2D at [2, 192k, 768]
                pass
            elif np.issubdtype(dtype, np.floating):
                dtype = np.float32
        fill = PAD_VALUES.get(key, 0)
        arr = np.empty((b, num_points) + vals[0].shape[1:], dtype)
        for i, v in enumerate(vals):
            arr[i, : lengths[i]] = v
            if lengths[i] < num_points:
                arr[i, lengths[i]:] = fill
        batch[key] = arr
    mask = np.zeros((b, num_points), bool)
    for i, n in enumerate(lengths):
        mask[i, :n] = True
    batch["mask"] = mask
    return batch


def collate_two_view(
    samples: List[Dict[str, np.ndarray]],
    view_points: int,
) -> Dict[str, np.ndarray]:
    """Collate MSC two-view samples (keys prefixed view1_/view2_ from
    ContrastiveViewsGenerator) into fixed-shape per-view buffers + masks.

    ``origin_coord`` is per-point here (pre-augmentation coords used for
    cross-mask generation and pair matching) and is padded like coord."""
    batch: Dict[str, np.ndarray] = {}
    for prefix in ("view1", "view2"):
        subs = []
        for s in samples:
            sub = {}
            for k, v in s.items():
                if not k.startswith(prefix + "_"):
                    continue
                key = k[len(prefix) + 1:]
                if key == "origin_coord":
                    key = "ocoord"  # sidestep pad_sample's origin_* passthrough
                sub[key] = v
            assert "coord" in sub, f"missing {prefix}_coord in sample"
            subs.append(pad_sample(sub, view_points))
        keys = set(subs[0])
        for p in subs[1:]:
            keys &= set(p)
        for key in keys:
            vals = [p[key] for p in subs]
            if not isinstance(vals[0], np.ndarray):
                continue
            if vals[0].shape[:1] != (view_points,) and key != "mask":
                continue
            arr = np.stack(vals)
            if key in INT_KEYS:
                arr = arr.astype(np.int32)
            elif arr.dtype != bool and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(np.float32)
            out_key = "origin_coord" if key == "ocoord" else key
            batch[f"{prefix}_{out_key}"] = arr
    return batch


def collate_ssl(
    samples: List[Dict[str, np.ndarray]],
    global_points: int,
    local_points: int,
    local_crop_num: int = 3,
) -> Dict[str, np.ndarray]:
    """Collate multi-crop SSL samples (keys prefixed global_crop{0,1}_ /
    local_crop{i}_) into fixed-shape per-crop buffers + per-crop masks."""
    prefixes = [("global_crop0", global_points), ("global_crop1", global_points)]
    prefixes += [(f"local_crop{i}", local_points) for i in range(local_crop_num)]
    batch: Dict[str, np.ndarray] = {}
    for prefix, target in prefixes:
        subs = []
        for s in samples:
            sub = {
                k[len(prefix) + 1 :]: v
                for k, v in s.items()
                if k.startswith(prefix + "_")
            }
            assert "coord" in sub, f"missing {prefix}_coord in sample"
            subs.append(pad_sample(sub, target))
        keys = set(subs[0])
        for p in subs[1:]:
            keys &= set(p)
        for key in keys:
            vals = [p[key] for p in subs]
            if not isinstance(vals[0], np.ndarray):
                continue
            if vals[0].shape[:1] != (target,) and key != "mask":
                continue
            arr = np.stack(vals)
            if key in INT_KEYS:
                arr = arr.astype(np.int32)
            elif arr.dtype != bool and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(np.float32)
            batch[f"{prefix}_{key}"] = arr
    return batch
