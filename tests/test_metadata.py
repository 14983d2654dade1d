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
