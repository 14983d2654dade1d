"""Packaged benchmark metadata + chunk-labeling tool."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

from scenesplat_tpu.data import metadata
from scenesplat_tpu.engines.eval import load_class_names, load_text_embeddings


def test_class_tables():
    assert len(metadata.class_labels("scannet20")) == 20
    assert len(metadata.class_labels("scannet200")) == 200
    assert len(metadata.class_labels("scannetpp_top100")) == 100
    assert len(metadata.class_labels("matterport21")) == 21
    assert len(metadata.class_labels("matterport160")) == 160
    # 4 valid classes; the reference's 6-row embedding is sliced (labels
    # 'others'/'sky' are preprocessed to ignore)
    assert len(metadata.class_labels("holicity")) == 4
    assert metadata.class_labels("scannet20")[:2] == ["wall", "floor"]


def test_benchmark_ids():
    ids20 = metadata.scannet_class_ids(20)
    assert ids20.shape == (20,) and ids20[0] == 1 and ids20[-1] == 39
    ids200 = metadata.scannet_class_ids(200)
    assert ids200.shape == (200,) and len(np.unique(ids200)) == 200


def test_scannet200_head_common_tail_partition():
    splits = metadata.scannet200_splits()
    all_cats = splits["head"] + splits["common"] + splits["tail"]
    assert len(all_cats) == 200
    assert set(all_cats) == set(metadata.class_labels("scannet200"))


def test_embeddings_normalized_and_sized():
    for name in metadata.builtin_names():
        emb = metadata.text_embeddings(name)
        assert emb.shape == (len(metadata.class_labels(name)), 768)
        np.testing.assert_allclose(
            np.linalg.norm(emb, axis=1), 1.0, atol=1e-5
        )


def test_builtin_scheme():
    names = load_class_names("builtin:scannet200")
    emb = load_text_embeddings("builtin:scannet200")
    assert len(names) == emb.shape[0] == 200


def test_label_mapping_tables():
    nyu = metadata.scannet_raw_to_nyu40()
    assert nyu["wall"] == 1 and nyu["chair"] == 5 and nyu["floor"] == 2
    raw = metadata.scannet_raw_to_id200()
    assert raw["wall"] == 1 and raw["chair"] == 2


def test_scene_splits():
    train = metadata.scene_split("scannetv2", "train")
    val = metadata.scene_split("scannetv2", "val")
    assert len(train) > 1000 and len(val) > 100
    assert train[0].startswith("scene") and not (set(train) & set(val))


def test_scannet200_dataset_class2id():
    from scenesplat_tpu.data.gs_datasets import ScanNet200GSDataset

    ds = ScanNet200GSDataset.__new__(ScanNet200GSDataset)
    assert ds.class2id.shape == (200,)


def _load_chunk_tool():
    path = (Path(__file__).resolve().parents[1]
            / "scripts" / "add_pc_labels_to_chunks.py")
    spec = importlib.util.spec_from_file_location("add_pc_labels", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["add_pc_labels"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_chunk_labeling_tool(tmp_path):
    tool = _load_chunk_tool()
    rng = np.random.default_rng(0)

    # original point cloud scene: 2D grid of labeled points
    pc_scene = tmp_path / "pc" / "train" / "sceneA"
    pc_scene.mkdir(parents=True)
    coords = rng.uniform(0, 2, size=(300, 3)).astype(np.float32)
    seg = (coords[:, 0] > 1).astype(np.int32)
    np.save(pc_scene / "coord.npy", coords)
    np.save(pc_scene / "segment_nyu.npy", seg)
    val_scene_src = tmp_path / "pc" / "val" / "sceneB"
    val_scene_src.mkdir(parents=True)
    np.save(val_scene_src / "coord.npy", coords)
    np.save(val_scene_src / "segment_nyu.npy", seg)
    np.save(val_scene_src / "instance.npy", seg)

    # GS side: one chunk near the x<1 half + a val scene folder
    gs_chunk = tmp_path / "gs" / "train_grid1x1_chunk" / "sceneA_0"
    gs_chunk.mkdir(parents=True)
    gs_xyz = rng.uniform(0, 0.9, size=(50, 3)).astype(np.float32)
    np.save(gs_chunk / "coord.npy", gs_xyz)
    gs_val = tmp_path / "gs" / "val" / "sceneB"
    gs_val.mkdir(parents=True)

    tool.copy_scene_level(tmp_path / "gs", tmp_path / "pc", ["val"])
    assert (gs_val / "pc_coord.npy").exists()
    assert (gs_val / "pc_segment_nyu.npy").exists()
    assert (gs_val / "pc_instance.npy").exists()

    tool.process_chunks(tmp_path / "gs", tmp_path / "pc", k=8,
                        dist_limit=0.25, write_semseg_label=True)
    pc_coord = np.load(gs_chunk / "pc_coord.npy")
    pc_seg = np.load(gs_chunk / "pc_segment_nyu.npy")
    assert pc_coord.shape[0] == pc_seg.shape[0] > 0
    # sliced points lie near the chunk (within dist limit of some gaussian)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(gs_xyz).query(pc_coord, k=1)
    assert (d <= 0.25 + 1e-6).all()
    # gaussian re-labeling: every gaussian close to a point gets its label
    gs_seg = np.load(gs_chunk / "segment_nyu.npy")
    assert gs_seg.shape[0] == gs_xyz.shape[0]
    assert set(np.unique(gs_seg)) <= {-1, 0, 1}


def _write_test_ply(path, verts, faces):
    """binary_little_endian PLY: x y z float32, r g b uchar, faces uchar+int32."""
    import struct

    n, f = len(verts), len(faces)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {f}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.encode())
        for v in verts:
            fh.write(struct.pack("<3f3B", *v[:3], *(int(c) for c in v[3:6])))
        for tri in faces:
            fh.write(struct.pack("<B3i", 3, *tri))


def test_preprocess_scannet_raw(tmp_path):
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "pp_scannet",
        Path(__file__).resolve().parents[1] / "scripts"
        / "preprocess_scannet_raw.py",
    )
    pp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pp)

    rng = np.random.default_rng(0)
    scene = tmp_path / "scans" / "scene9999_00"
    scene.mkdir(parents=True)
    n = 30
    verts = np.concatenate(
        [rng.uniform(0, 2, (n, 3)).astype(np.float32),
         rng.integers(0, 255, (n, 3)).astype(np.float32)], 1,
    )
    faces = np.stack([np.arange(n - 2), np.arange(1, n - 1),
                      np.arange(2, n)], 1)
    _write_test_ply(scene / "scene9999_00_vh_clean_2.ply", verts, faces)
    # 3 segments; group 0 = wall (nyu40 1 -> idx 0), group 1 = chair
    seg_indices = np.repeat([0, 1, 2], n // 3).tolist()
    (scene / "scene9999_00_vh_clean_2.0.010000.segs.json").write_text(
        _json.dumps({"segIndices": seg_indices}))
    (scene / "scene9999_00.aggregation.json").write_text(_json.dumps({
        "segGroups": [
            {"id": 0, "label": "wall", "segments": [0]},
            {"id": 1, "label": "chair", "segments": [1]},
            {"id": 2, "label": "bananas", "segments": [2]},
        ]}))

    out = pp.process_scene(scene, tmp_path / "npy",
                           train_scenes={"scene9999_00"}, val_scenes=set())
    out = Path(out)
    assert out.parts[-2] == "train"
    coord = np.load(out / "coord.npy")
    seg20 = np.load(out / "segment20.npy")
    seg200 = np.load(out / "segment200.npy")
    inst = np.load(out / "instance.npy")
    normal = np.load(out / "normal.npy")
    assert coord.shape == (n, 3) and normal.shape == (n, 3)
    np.testing.assert_allclose(coord, verts[:, :3], rtol=1e-6)
    k = n // 3
    assert (seg20[:k] == 0).all()           # wall -> ScanNet-20 index 0
    assert (seg20[k:2 * k] == 4).all()      # chair: nyu40 5 -> ids20[4]
    assert (seg20[2 * k:3 * k] == -1).all()  # 'bananas' not in tsv
    assert (seg200[:k] == 0).all()          # wall raw id 1 -> ids200[0]
    assert (inst[:k] == 0).all() and (inst[k:2 * k] == 1).all()
    np.testing.assert_allclose(np.linalg.norm(normal, axis=1), 1.0, atol=1e-5)
