"""ScanNet RGB-D frame-pair generation (the MSC pretraining data source).

Counterpart of the reference scannet_pair pipeline
(pointcept/datasets/preprocessing/scannet/scannet_pair/{SensorData,reader,
point_cloud_extractor,compute_full_overlapping,generage_list}.py):

1. decode each scene's `.sens` stream (ScanNet SensorData container:
   header with intrinsics + per-frame pose/jpeg-color/zlib-u16-depth),
   keeping every ``frame_skip``-th frame;
2. unproject each depth frame through the depth intrinsics to a world-frame
   point cloud (same math as the reference extractor, incl. the bx/by
   intrinsic shift terms) and save frame dicts {coord, color} as .pth;
3. voxel-downsample frames and compute the pairwise overlap ratio
   (fraction of one frame's voxel points with a neighbor of the other
   within 1.5 * voxel) with scipy cKDTree — no open3d dependency;
4. write per-scene pcd/overlap.txt and a root-level overlap30.txt listing
   pairs with overlap >= threshold.

Usage:
    python scripts/generate_scannet_pairs.py \
        --dataset-root /data/scannet/scans --output-root /data/scannet_pair \
        [--frame-skip 25] [--voxel 0.05] [--overlap-threshold 0.3]
"""

from __future__ import annotations

import argparse
import io
import struct
import zlib
from pathlib import Path

import numpy as np


class SensStream:
    """Minimal ScanNet .sens decoder (format: ScanNet SensorData v4)."""

    def __init__(self, path):
        self.f = open(path, "rb")
        f = self.f
        (self.version,) = struct.unpack("<I", f.read(4))
        (strlen,) = struct.unpack("<Q", f.read(8))
        self.sensor_name = f.read(strlen).decode("ascii", "replace")
        self.intrinsic_color = np.frombuffer(
            f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_color = np.frombuffer(
            f.read(64), np.float32).reshape(4, 4)
        self.intrinsic_depth = np.frombuffer(
            f.read(64), np.float32).reshape(4, 4)
        self.extrinsic_depth = np.frombuffer(
            f.read(64), np.float32).reshape(4, 4)
        (self.color_compression,) = struct.unpack("<i", f.read(4))
        (self.depth_compression,) = struct.unpack("<i", f.read(4))
        (self.color_width,) = struct.unpack("<I", f.read(4))
        (self.color_height,) = struct.unpack("<I", f.read(4))
        (self.depth_width,) = struct.unpack("<I", f.read(4))
        (self.depth_height,) = struct.unpack("<I", f.read(4))
        (self.depth_shift,) = struct.unpack("<f", f.read(4))
        (self.num_frames,) = struct.unpack("<Q", f.read(8))

    def frames(self):
        """Yields (index, pose 4x4, color uint8 [H, W, 3] | None,
        depth uint16 [h, w])."""
        for i in range(self.num_frames):
            pose = np.frombuffer(self.f.read(64), np.float32).reshape(4, 4)
            self.f.read(16)  # color + depth timestamps
            (csize,) = struct.unpack("<Q", self.f.read(8))
            (dsize,) = struct.unpack("<Q", self.f.read(8))
            cbytes = self.f.read(csize)
            dbytes = self.f.read(dsize)
            yield i, pose, cbytes, dbytes

    def decode_color(self, cbytes):
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(cbytes)).convert("RGB"))

    def decode_depth(self, dbytes):
        raw = zlib.decompress(dbytes)
        return np.frombuffer(raw, np.uint16).reshape(
            self.depth_height, self.depth_width
        )


def unproject(depth, intrinsic, pose, depth_shift=1000.0, color=None):
    """Depth [h, w] u16 -> world-frame points (reference extractor math)."""
    h, w = depth.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth.astype(np.float64) / depth_shift
    mask = depth.reshape(-1) != 0
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    bx, by = intrinsic[0, 3], intrinsic[1, 3]
    zf = z.reshape(-1)[mask]
    x = (xx.reshape(-1)[mask] - cx) * zf / fx + bx
    y = (yy.reshape(-1)[mask] - cy) * zf / fy + by
    pts = np.stack([x, y, zf, np.ones_like(zf)], 1)
    world = pts @ pose.astype(np.float64).T
    out = dict(coord=world[:, :3].astype(np.float32))
    if color is not None:
        ch, cw = color.shape[:2]
        if (ch, cw) != (h, w):
            from PIL import Image

            color = np.asarray(
                Image.fromarray(color).resize((w, h))
            )
        out["color"] = color.reshape(-1, 3)[mask]
    return out


def voxel_centroids(coord, voxel):
    keys = np.floor(coord / voxel).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    n = inv.max() + 1
    sums = np.zeros((n, 3))
    cnts = np.zeros(n)
    np.add.at(sums, inv, coord)
    np.add.at(cnts, inv, 1)
    return sums / cnts[:, None]


def overlap_ratio(a, b, voxel):
    """max of directional match fractions at radius 1.5 * voxel (reference
    compute_overlap_ratio)."""
    from scipy.spatial import cKDTree

    ta, tb = cKDTree(a), cKDTree(b)
    da, _ = tb.query(a, k=1)
    db, _ = ta.query(b, k=1)
    r = 1.5 * voxel
    return max(float((da <= r).mean()), float((db <= r).mean()))


def process_scene(sens_path, out_root, frame_skip=25, voxel=0.05,
                  export_images=False):
    import torch

    sens_path = Path(sens_path)
    scene_id = sens_path.parent.name
    out = Path(out_root) / scene_id
    pcd_dir = out / "pcd"
    pcd_dir.mkdir(parents=True, exist_ok=True)
    s = SensStream(sens_path)
    np.savetxt(out / "intrinsic_depth.txt", s.intrinsic_depth)
    frames = []
    for i, pose, cbytes, dbytes in s.frames():
        if i % frame_skip != 0:
            continue
        if not np.isfinite(pose).all():
            continue
        depth = s.decode_depth(dbytes)
        color = s.decode_color(cbytes) if cbytes else None
        pcd = unproject(depth, s.intrinsic_depth, pose,
                        s.depth_shift, color=color)
        if not len(pcd["coord"]):
            continue
        torch.save(pcd, pcd_dir / f"{i}.pth")
        frames.append((f"{i}.pth", voxel_centroids(pcd["coord"], voxel)))
    # pairwise overlap
    with open(pcd_dir / "overlap.txt", "w") as f:
        for i in range(len(frames)):
            for j in range(i + 1, len(frames)):
                ov = overlap_ratio(frames[i][1], frames[j][1], voxel)
                f.write(
                    f"/{scene_id}/pcd/{frames[i][0]} "
                    f"/{scene_id}/pcd/{frames[j][0]} {ov}\n"
                )
    return str(out)


def collect_pairs(out_root, threshold=0.3):
    """generage_list.py equivalent: root-level overlap30.txt."""
    out_root = Path(out_root)
    with open(out_root / "overlap30.txt", "w") as f:
        for ov_file in sorted(out_root.glob("*/pcd/overlap.txt")):
            for line in ov_file.read_text().splitlines():
                p0, p1, ov = line.split()
                if float(ov) >= threshold:
                    f.write(f"{p0} {p1} {ov}\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset-root", required=True, type=Path)
    ap.add_argument("--output-root", required=True, type=Path)
    ap.add_argument("--frame-skip", type=int, default=25)
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--overlap-threshold", type=float, default=0.3)
    args = ap.parse_args()
    sens = sorted(args.dataset_root.glob("scene*/*.sens"))
    print(f"{len(sens)} .sens streams")
    for p in sens:
        print("scene done:", process_scene(
            p, args.output_root, args.frame_skip, args.voxel
        ))
    collect_pairs(args.output_root, args.overlap_threshold)
    print("wrote overlap30.txt")


if __name__ == "__main__":
    main()
