"""Fixture-driven tests for scripts/preprocess_dataset_gs.py: each dataset
spec is run on tiny synthetic raw inputs (a real binary GS .ply + a fused
point cloud dir) and checked against exact expected outputs, mirroring the
per-dataset quirks of the reference converters
(pointcept/datasets/preprocessing/*/preprocess_*_gs.py):

  - scannet: segment20/segment200/instance in int16, OBB pruning (+0.25 m)
  - scannetpp: segment/instance, OBB pruning (+0.2 m)
  - matterport3d: segment + segment_nyu_160, NO pruning
  - holicity: segment only, NO pruning
  - kitti360: pc_coord/pc_segment pass-through on every split
  - all: 1-NN transfer with NO distance cutoff; normal.npy transferred
    whenever the fused cloud has normals; GS activations
    (sigmoid/exp/quat-normalize+sign-fix/SH-DC color).
"""

import struct

import numpy as np
import pytest

from scripts.preprocess_dataset_gs import (
    DATASET_SPECS,
    pca_obb_mask,
    process_scene,
    transfer_labels,
)

SH_C0 = 0.28209479177387814


def write_gs_ply(path, coord, opacity_raw=None, scale_log=None, quat_raw=None,
                 f_dc=None):
    """Minimal binary_little_endian 3DGS ply in the standard field layout."""
    n = len(coord)
    rng = np.random.default_rng(0)
    if opacity_raw is None:
        opacity_raw = rng.normal(size=n).astype(np.float32)
    if scale_log is None:
        scale_log = rng.normal(size=(n, 3)).astype(np.float32)
    if quat_raw is None:
        quat_raw = rng.normal(size=(n, 4)).astype(np.float32)
    if f_dc is None:
        f_dc = rng.normal(size=(n, 3)).astype(np.float32)
    names = (["x", "y", "z"] + [f"f_dc_{i}" for i in range(3)] + ["opacity"]
             + [f"scale_{i}" for i in range(3)] + [f"rot_{i}" for i in range(4)])
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    rows = np.concatenate(
        [coord, f_dc, opacity_raw[:, None], scale_log, quat_raw], axis=1
    ).astype("<f4")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rows.tobytes())
    return dict(opacity_raw=opacity_raw, scale_log=scale_log,
                quat_raw=quat_raw, f_dc=f_dc)


def make_pc_dir(root, coord, labels=None, normal=None):
    root.mkdir(parents=True, exist_ok=True)
    np.save(root / "coord.npy", coord.astype(np.float32))
    for name, val in (labels or {}).items():
        np.save(root / f"{name}.npy", val)
    if normal is not None:
        np.save(root / "normal.npy", normal.astype(np.float32))


def brute_nn(gs, pc):
    return np.argmin(((gs[:, None] - pc[None]) ** 2).sum(-1), axis=1)


@pytest.fixture()
def cloud():
    rng = np.random.default_rng(7)
    pc = rng.uniform(0, 2, (80, 3)).astype(np.float32)
    normal = rng.normal(size=(80, 3)).astype(np.float32)
    labels = dict(
        segment20=rng.integers(0, 20, 80).astype(np.int16),
        segment200=rng.integers(0, 200, 80).astype(np.int16),
        segment=rng.integers(0, 10, 80).astype(np.int64),
        segment_nyu_160=rng.integers(0, 160, 80).astype(np.int64),
        instance=rng.integers(0, 6, 80).astype(np.int16),
    )
    # gaussians: 30 jittered near cloud points + one far outlier
    gs = np.concatenate(
        [pc[:30] + 0.003, [[50.0, 50.0, 50.0]]]
    ).astype(np.float32)
    return pc, normal, labels, gs


def test_gs_activations(tmp_path):
    coord = np.array([[0, 0, 0], [1, 2, 3]], np.float32)
    raw = write_gs_ply(
        tmp_path / "s.ply", coord,
        quat_raw=np.array([[-2.0, 0, 0, 0], [0.5, 0.5, -0.5, 0.5]], np.float32),
    )
    out = process_scene("holicity", str(tmp_path / "s.ply"), None,
                        str(tmp_path / "out"))
    opacity = np.load(tmp_path / "out" / "opacity.npy")
    np.testing.assert_allclose(
        opacity, 1 / (1 + np.exp(-raw["opacity_raw"])), rtol=1e-6)
    scale = np.load(tmp_path / "out" / "scale.npy")
    np.testing.assert_allclose(scale, np.exp(raw["scale_log"]), rtol=1e-6)
    quat = np.load(tmp_path / "out" / "quat.npy")
    # normalized + sign-fixed (w >= 0): [-2,0,0,0] -> [1,0,0,0] up to sign
    np.testing.assert_allclose(quat[0], [1, 0, 0, 0], atol=1e-5)
    assert (quat[:, 0] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(quat, axis=1), 1.0, atol=1e-5)
    color = np.load(tmp_path / "out" / "color.npy")
    expect = (np.clip(raw["f_dc"] * SH_C0 + 0.5, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(color, expect)


def test_scannet_spec(tmp_path, cloud):
    pc, normal, labels, gs = cloud
    make_pc_dir(tmp_path / "pc", pc,
                {k: labels[k] for k in ("segment20", "segment200", "instance")},
                normal)
    write_gs_ply(tmp_path / "s.ply", gs)
    out = tmp_path / "out"
    process_scene("scannet", str(tmp_path / "s.ply"), str(tmp_path / "pc"),
                  str(out), split="val")
    coord = np.load(out / "coord.npy")
    # the far outlier is pruned by the +0.25 m OBB
    assert len(coord) == 30
    np.testing.assert_allclose(coord, gs[:30], atol=1e-6)
    nn = brute_nn(coord, pc)
    for key in ("segment20", "segment200"):
        got = np.load(out / f"{key}.npy")
        assert got.dtype == np.int16
        np.testing.assert_array_equal(got, labels[key][nn])
    inst = np.load(out / "instance.npy")
    assert inst.dtype == np.int16
    np.testing.assert_array_equal(inst, labels["instance"][nn])
    np.testing.assert_allclose(np.load(out / "normal.npy"), normal[nn])
    # eval pass-through of the fused cloud
    np.testing.assert_allclose(np.load(out / "pc_coord.npy"), pc)
    np.testing.assert_array_equal(
        np.load(out / "pc_segment20.npy"), labels["segment20"].astype(np.int32))
    assert np.load(out / "pc_segment20.npy").dtype == np.int32
    # train split writes no pass-through for scannet
    out2 = tmp_path / "out_train"
    process_scene("scannet", str(tmp_path / "s.ply"), str(tmp_path / "pc"),
                  str(out2), split="train")
    assert not (out2 / "pc_coord.npy").exists()


def test_scannetpp_spec(tmp_path, cloud):
    pc, normal, labels, gs = cloud
    make_pc_dir(tmp_path / "pc", pc,
                {k: labels[k] for k in ("segment", "instance")}, normal)
    write_gs_ply(tmp_path / "s.ply", gs)
    out = tmp_path / "out"
    process_scene("scannetpp", str(tmp_path / "s.ply"), str(tmp_path / "pc"),
                  str(out))
    coord = np.load(out / "coord.npy")
    assert len(coord) == 30  # +0.2 m OBB pruning active
    nn = brute_nn(coord, pc)
    seg = np.load(out / "segment.npy")
    # dtype inherited from the fused cloud (reference scannetpp keeps it)
    assert seg.dtype == labels["segment"].dtype
    np.testing.assert_array_equal(seg, labels["segment"][nn])
    np.testing.assert_array_equal(np.load(out / "instance.npy"),
                                  labels["instance"][nn])


def test_matterport3d_spec(tmp_path, cloud):
    pc, normal, labels, gs = cloud
    make_pc_dir(tmp_path / "pc", pc,
                {k: labels[k] for k in ("segment", "segment_nyu_160")}, normal)
    write_gs_ply(tmp_path / "s.ply", gs)
    out = tmp_path / "out"
    process_scene("matterport3d", str(tmp_path / "s.ply"),
                  str(tmp_path / "pc"), str(out))
    coord = np.load(out / "coord.npy")
    # pruning is DISABLED for matterport (reference l.252): outlier kept,
    # and — like the reference — it still inherits its 1-NN label
    assert len(coord) == 31
    nn = brute_nn(coord, pc)
    np.testing.assert_array_equal(np.load(out / "segment.npy"),
                                  labels["segment"][nn])
    np.testing.assert_array_equal(np.load(out / "segment_nyu_160.npy"),
                                  labels["segment_nyu_160"][nn])
    assert not (out / "instance.npy").exists()


def test_holicity_spec(tmp_path, cloud):
    pc, normal, labels, gs = cloud
    # holicity fused clouds may carry extra label files; only segment is used
    make_pc_dir(tmp_path / "pc", pc,
                {k: labels[k] for k in ("segment", "instance")}, normal=None)
    write_gs_ply(tmp_path / "s.ply", gs)
    out = tmp_path / "out"
    process_scene("holicity", str(tmp_path / "s.ply"), str(tmp_path / "pc"),
                  str(out), split="val")
    assert len(np.load(out / "coord.npy")) == 31  # no pruning
    assert not (out / "instance.npy").exists()
    assert not (out / "normal.npy").exists()  # no normals in the cloud
    assert not (out / "pc_coord.npy").exists()  # no eval pass-through


def test_kitti360_spec(tmp_path, cloud):
    pc, normal, labels, gs = cloud
    make_pc_dir(tmp_path / "pc", pc, {"segment": labels["segment"]}, normal)
    write_gs_ply(tmp_path / "s.ply", gs)
    out = tmp_path / "out"
    # kitti360 writes the fused-cloud pass-through for EVERY split
    # (reference preprocess_kitti360_gs.py:389-390)
    process_scene("kitti360", str(tmp_path / "s.ply"), str(tmp_path / "pc"),
                  str(out), split="train")
    np.testing.assert_allclose(np.load(out / "pc_coord.npy"), pc)
    np.testing.assert_array_equal(
        np.load(out / "pc_segment.npy"), labels["segment"].astype(np.int32))


def test_no_distance_cutoff_by_default(tmp_path, cloud):
    """The reference transfers labels unconditionally — a far gaussian keeps
    its 1-NN label unless --max-dist is given."""
    pc, _, labels, gs = cloud
    out = transfer_labels(gs, pc, labels["segment"])
    nn = brute_nn(gs, pc)
    np.testing.assert_array_equal(out, labels["segment"][nn])
    out = transfer_labels(gs, pc, labels["segment"], max_dist=0.1)
    assert out[-1] == -1  # the outlier
    np.testing.assert_array_equal(out[:30], labels["segment"][nn[:30]])


def test_pca_obb_mask_is_superset_of_cloud():
    rng = np.random.default_rng(3)
    pc = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    # every cloud point is inside its own OBB; far points are not
    gs = np.concatenate([pc, [[30, 0, 0]]]).astype(np.float32)
    mask = pca_obb_mask(pc, gs, enlargement=0.25)
    assert mask[:100].all() and not mask[100]


def test_dataset_specs_cover_reference():
    assert set(DATASET_SPECS) == {
        "scannet", "scannetpp", "matterport3d", "holicity", "kitti360"
    }
    assert DATASET_SPECS["scannet"]["bbox_prune"] == 0.25
    assert DATASET_SPECS["scannetpp"]["bbox_prune"] == 0.2
    for name in ("matterport3d", "holicity", "kitti360"):
        assert DATASET_SPECS[name]["bbox_prune"] is None
    assert DATASET_SPECS["kitti360"]["pc_always"] is True


def test_matterport160_loader_accepts_reference_names(tmp_path):
    """Matterport3D_160_GSDataset resolves the reference's on-disk
    segment_nyu_160 into the canonical 'segment' slot."""
    from scenesplat_tpu.data.gs_datasets import Matterport3D_160_GSDataset

    scene = tmp_path / "train" / "sceneA"
    scene.mkdir(parents=True)
    n = 16
    rng = np.random.default_rng(0)
    np.save(scene / "coord.npy", rng.uniform(0, 1, (n, 3)).astype(np.float32))
    np.save(scene / "segment_nyu_160.npy", np.arange(n, dtype=np.int64))
    ds = Matterport3D_160_GSDataset(
        data_root=str(tmp_path), split="train", transform=[], test_mode=False,
        loop=1,
    )
    data = ds.get_data(0)
    np.testing.assert_array_equal(data["segment"], np.arange(n))
    assert data["segment"].dtype == np.int32


def test_min_volume_obb_recovers_rotated_box():
    """A rotated box of points: the hull-triangle OBB must recover ~the
    box's own volume (a PCA box on such data can be >1.5x larger), and the
    mask must keep exactly the points inside the rotated slab."""
    from scripts.preprocess_dataset_gs import _min_volume_obb_frame

    rng = np.random.default_rng(11)
    # box 4 x 2 x 1, rotated by an arbitrary rotation
    pts = rng.uniform([-2, -1, -0.5], [2, 1, 0.5], (4000, 3))
    a, b, c = 0.7, 0.4, 1.1
    rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    rot = rz @ ry @ rx
    pc = (pts @ rot.T + np.array([5.0, -3.0, 2.0])).astype(np.float64)

    axes = _min_volume_obb_frame(pc)
    proj = pc @ axes
    vol = np.prod(proj.max(0) - proj.min(0))
    true_vol = np.prod(pts.max(0) - pts.min(0))
    assert vol <= true_vol * 1.05  # recovered the box frame (PCA would not)

    # mask semantics: inside-points kept, a point just past a face+margin cut
    inside = pc[:100]
    outside = (np.array([[2.6, 0, 0]]) @ rot.T) + np.array([5.0, -3.0, 2.0])
    mask = pca_obb_mask(pc, np.concatenate([inside, outside]), enlargement=0.25)
    assert mask[:100].all() and not mask[100]


def test_chunking_with_pc(tmp_path):
    """KITTI-360 joint GS+PC chunking (reference kitti360/
    sampling_chunking_data_gs_pc.py:10-167): pc_* assets ride the same BEV
    tiles, masked by pc_coord recentred by its OWN min; chunk acceptance
    counts Gaussians only."""
    from scripts.sampling_chunking_data_gs import chunk_scene

    rng = np.random.default_rng(3)
    # GS cloud spanning x in [10, 22): two 6 m tiles at stride 6
    n = 400
    coord = np.stack([
        rng.uniform(10, 22, n), rng.uniform(5, 11, n), rng.uniform(0, 2, n)
    ], 1).astype(np.float32)
    opacity = rng.random(n).astype(np.float32)
    # eval cloud with a DIFFERENT offset (min differs from the GS min): the
    # per-cloud recentring must align the two despite the offset
    m = 250
    pc_coord = np.stack([
        rng.uniform(100, 112, m), rng.uniform(50, 56, m), rng.uniform(0, 2, m)
    ], 1).astype(np.float32)
    pc_segment = rng.integers(0, 19, m).astype(np.int64)

    scene = tmp_path / "in" / "test" / "sceneA"
    scene.mkdir(parents=True)
    np.save(scene / "coord.npy", coord)
    np.save(scene / "opacity.npy", opacity)
    np.save(scene / "pc_coord.npy", pc_coord)
    np.save(scene / "pc_segment.npy", pc_segment)

    n_chunks = chunk_scene(
        "sceneA", str(tmp_path / "in"), str(tmp_path / "out"), "test",
        grid_size=None, chunk_range=(6, 6), chunk_stride=(6, 6),
        chunk_minimum_size=10, with_pc=True,
    )
    assert n_chunks == 2
    out_split = next((tmp_path / "out").iterdir())

    c0 = coord - coord.min(0)
    p0 = pc_coord - pc_coord.min(0)
    for ci in range(2):
        x0 = 6.0 * ci
        gsel = ((c0[:, 0] >= x0) & (c0[:, 0] < x0 + 6)
                & (c0[:, 1] >= 0) & (c0[:, 1] < 6))
        psel = ((p0[:, 0] >= x0) & (p0[:, 0] < x0 + 6)
                & (p0[:, 1] >= 0) & (p0[:, 1] < 6))
        d = out_split / f"sceneA_{ci}"
        np.testing.assert_array_equal(np.load(d / "coord.npy"), coord[gsel])
        np.testing.assert_array_equal(np.load(d / "opacity.npy"),
                                      opacity[gsel])
        np.testing.assert_array_equal(np.load(d / "pc_coord.npy"),
                                      pc_coord[psel])
        np.testing.assert_array_equal(np.load(d / "pc_segment.npy"),
                                      pc_segment[psel])
        assert psel.sum() > 0  # the offset clouds actually overlap tiles


def test_chunking_without_pc_ignores_pc_assets(tmp_path):
    from scripts.sampling_chunking_data_gs import chunk_scene

    rng = np.random.default_rng(4)
    n = 60
    coord = rng.uniform(0, 5.9, (n, 3)).astype(np.float32)
    scene = tmp_path / "in" / "train" / "s"
    scene.mkdir(parents=True)
    np.save(scene / "coord.npy", coord)
    np.save(scene / "pc_coord.npy", rng.uniform(0, 6, (70, 3)))
    chunk_scene("s", str(tmp_path / "in"), str(tmp_path / "out"), "train",
                grid_size=None, chunk_range=(6, 6), chunk_stride=(3, 3),
                chunk_minimum_size=5)
    d = next((tmp_path / "out").iterdir()) / "s_0"
    assert (d / "coord.npy").exists()
    assert not (d / "pc_coord.npy").exists()


def _write_ascii_mesh_ply(path, verts, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        for nm in ("x", "y", "z", "red", "green", "blue"):
            f.write(f"property float {nm}\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v in verts:
            f.write(" ".join(f"{x:.6f}" for x in v) + "\n")
        for fc in faces:
            f.write("3 " + " ".join(str(i) for i in fc) + "\n")


def test_arkitscenes_mesh_preprocess(tmp_path):
    """Reference arkitscenes/preprocess_arkitscenes_mesh.py:28-60 parity:
    area-weighted vertex normals (the in-test golden replicates the
    reference's per-face loop literally) and the 3dod split/scene layout."""
    from scripts.preprocess_arkitscenes_mesh import parse_scene

    rng = np.random.default_rng(5)
    verts = np.concatenate(
        [rng.uniform(0, 2, (9, 3)), rng.uniform(0, 1, (9, 3))], 1
    ).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 1, 3], [4, 5, 6], [6, 7, 8], [0, 2, 4]])
    scene = tmp_path / "3dod" / "Training" / "sc001"
    scene.mkdir(parents=True)
    _write_ascii_mesh_ply(scene / "sc001_3dod_mesh.ply", verts, faces)

    parse_scene(str(scene / "sc001_3dod_mesh.ply"), str(tmp_path / "out"))

    out = tmp_path / "out" / "Training" / "sc001"
    coord = np.load(out / "coord.npy")
    color = np.load(out / "color.npy")
    normal = np.load(out / "normal.npy")
    np.testing.assert_allclose(coord, verts[:, :3], atol=1e-5)
    np.testing.assert_allclose(color, verts[:, 3:6], atol=1e-5)

    # golden: the reference's own vertex_normal (loop form, l.38-48)
    vertex = verts[:, :3].astype(np.float64)
    v01 = vertex[faces[:, 1]] - vertex[faces[:, 0]]
    v02 = vertex[faces[:, 2]] - vertex[faces[:, 0]]
    vec = np.cross(v01, v02)
    length = np.sqrt((vec ** 2).sum(1, keepdims=True)) + 1e-8
    nf = vec / length * (length * 0.5)
    nv = np.zeros_like(vertex)
    for i in range(faces.shape[0]):
        nv[faces[i]] += nf[i]
    nv = nv / (np.sqrt((nv ** 2).sum(1, keepdims=True)) + 1e-8)
    np.testing.assert_allclose(normal, nv, atol=1e-4)


def test_arkitscenes_mesh_pth_format(tmp_path):
    from scripts.preprocess_arkitscenes_mesh import parse_scene

    rng = np.random.default_rng(6)
    verts = np.concatenate(
        [rng.uniform(0, 2, (5, 3)), rng.uniform(0, 1, (5, 3))], 1
    ).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]])
    scene = tmp_path / "3dod" / "Validation" / "sc9"
    scene.mkdir(parents=True)
    _write_ascii_mesh_ply(scene / "sc9_3dod_mesh.ply", verts, faces)
    parse_scene(str(scene / "sc9_3dod_mesh.ply"), str(tmp_path / "out"),
                fmt="pth")
    import torch

    d = torch.load(tmp_path / "out" / "Validation" / "sc9.pth",
                   weights_only=False)
    assert d["scene_id"] == "sc9"
    assert set(d) == {"coord", "color", "scene_id", "normal"}
    np.testing.assert_allclose(d["coord"], verts[:, :3], atol=1e-5)
