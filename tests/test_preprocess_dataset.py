"""Per-dataset GS preprocessing: 1-NN label transfer + spec table."""

import numpy as np

from scripts.preprocess_dataset_gs import DATASET_SPECS, transfer_labels


def test_dataset_specs_cover_reference():
    assert set(DATASET_SPECS) == {
        "scannet", "scannetpp", "matterport3d", "holicity", "kitti360"
    }
    assert DATASET_SPECS["scannet"]["label_keys"]["segment20"] == "segment20"
    assert DATASET_SPECS["matterport3d"]["label_keys"]["segment_nyu_160"] == "segment160"


def test_transfer_labels_nn_and_cutoff():
    rng = np.random.default_rng(0)
    pc = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    labels = rng.integers(0, 5, 200).astype(np.int32)
    # gaussians near pc points inherit labels; a far-away one gets -1
    gs = np.concatenate([pc[:50] + 0.001, [[9.0, 9.0, 9.0]]]).astype(np.float32)
    out = transfer_labels(gs, pc, labels, max_dist=0.1)
    assert (out[:50] == labels[:50]).all()
    assert out[50] == -1
