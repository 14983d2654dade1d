"""Data layer: transforms, GridSample, collate, datasets, loader."""

import os

import numpy as np
import pytest

from scenesplat_tpu.data import (
    Compose,
    ConcatDataset,
    Loader,
    MultiDatasetLoader,
    TRANSFORMS,
    build_dataset,
    collate_padded,
)
from scenesplat_tpu.data.transforms import (
    GridSample,
    RandomFlip,
    RandomRotate,
    _matrix_to_quat_wxyz,
    _quat_wxyz_to_matrix,
    fnv_hash_vec,
)


def random_scene(rng, n=1000, with_gs=True):
    d = {
        "coord": rng.normal(size=(n, 3)).astype(np.float32) * 2,
        "color": rng.uniform(0, 255, (n, 3)).astype(np.float32),
        "segment": rng.integers(-1, 5, n).astype(np.int32),
    }
    if with_gs:
        q = rng.normal(size=(n, 4))
        d["quat"] = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
        d["scale"] = rng.uniform(0.001, 0.5, (n, 3)).astype(np.float32)
        d["opacity"] = rng.uniform(0, 1, (n, 1)).astype(np.float32)
        d["lang_feat"] = rng.normal(size=(n, 8)).astype(np.float16)
        d["valid_feat_mask"] = rng.random(n) > 0.3
    return d


def test_quat_matrix_roundtrip(rng):
    q = rng.normal(size=(500, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    m = _quat_wxyz_to_matrix(q)
    q2 = _matrix_to_quat_wxyz(m)
    # quaternions are sign-ambiguous
    dot = np.abs(np.sum(q * q2, axis=1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_rotate_rotates_quat_consistently(rng):
    d = random_scene(rng, 200)
    before = d["quat"].copy()
    coord_before = d["coord"].copy()
    t = RandomRotate(angle=[0.5, 0.5], axis="z", p=1.0, center=[0, 0, 0])
    d = t(d)
    # coord rotated by R; gaussian orientation left-multiplied by R
    m_before = _quat_wxyz_to_matrix(before)
    m_after = _quat_wxyz_to_matrix(d["quat"])
    r = m_after[0] @ m_before[0].T
    np.testing.assert_allclose(
        d["coord"][0], coord_before[0] @ r.T, atol=1e-4
    )


def test_flip_preserves_unit_quat(rng):
    d = random_scene(rng, 100)
    d = RandomFlip(p=1.0)(d)
    norms = np.linalg.norm(d["quat"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_fnv_hash_matches_reference(rng):
    from conftest import load_reference_module

    arr = rng.integers(0, 1000, (500, 3)).astype(np.int64)
    got = fnv_hash_vec(arr)
    ref = load_reference_module("pointcept/datasets/transform.py", "ref_transform")
    if ref is None:
        pytest.skip("reference not available")
    expected = ref.GridSample.fnv_hash_vec(arr)
    np.testing.assert_array_equal(got, expected)


def test_grid_sample_train(rng):
    d = random_scene(rng, 2000)
    gs = GridSample(
        grid_size=0.5,
        mode="train",
        keys=("coord", "color", "segment", "quat", "scale", "opacity",
              "lang_feat", "valid_feat_mask"),
        return_grid_coord=True,
    )
    n_cells = len(np.unique(np.floor(d["coord"] / 0.5).astype(int), axis=0))
    out = gs(d)
    assert out["coord"].shape[0] == n_cells
    assert out["grid_coord"].shape == (n_cells, 3)
    assert out["grid_coord"].min() >= 0
    for k in ("color", "segment", "quat", "lang_feat"):
        assert out[k].shape[0] == n_cells


def test_grid_sample_test_fragments_cover_all_cells(rng):
    d = random_scene(rng, 800)
    gs = GridSample(
        grid_size=0.8, mode="test", keys=("coord", "color", "segment"),
        return_grid_coord=True,
    )
    frags = gs(d)
    assert isinstance(frags, list) and len(frags) >= 1
    n_cells = len(np.unique(np.floor(d["coord"] / 0.8).astype(int), axis=0))
    for f in frags:
        assert f["coord"].shape[0] == n_cells
        assert "index" in f
    all_idx = np.unique(np.concatenate([f["index"] for f in frags]))
    # fragments jointly cover every point whose cell has <= count.max members
    assert all_idx.size >= n_cells


def test_collate_padded(rng):
    samples = [random_scene(rng, n) for n in (100, 57)]
    batch = collate_padded(samples, num_points=128)
    assert batch["coord"].shape == (2, 128, 3)
    assert batch["mask"].sum() == 157
    assert batch["segment"][1, 57:].max() == -1  # padded labels are ignored
    assert batch["segment"].dtype == np.int32


def test_collate_dtypes_and_values(rng):
    """Dtype contract: ints -> int32, floats -> float32 EXCEPT half-precision
    stays f16 (SigLIP2 lang_feat ships to device as-is; the f16->f32 upcast
    happens in the jitted step where it is exact and free); values equal a
    naive pad+stack."""
    samples = [random_scene(rng, n) for n in (100, 57)]
    for s, n in zip(samples, (100, 57)):
        s["lang_feat"] = s["lang_feat"].astype(np.float16)
        s["valid_feat_mask"] = rng.random(n) > 0.5
    batch = collate_padded(samples, num_points=128)
    assert batch["lang_feat"].dtype == np.float16
    assert batch["coord"].dtype == np.float32
    assert batch["valid_feat_mask"].dtype == bool
    for i, s in enumerate(samples):
        n = s["coord"].shape[0]
        for k in ("coord", "lang_feat", "segment", "valid_feat_mask"):
            np.testing.assert_array_equal(
                batch[k][i, :n], s[k].astype(batch[k].dtype)
            )
        assert not batch["mask"][i, n:].any()
        np.testing.assert_array_equal(batch["segment"][i, n:], -1)
        np.testing.assert_array_equal(batch["lang_feat"][i, n:], 0)


def test_collate_mixing(rng):
    samples = [random_scene(rng, 50) for _ in range(4)]
    np.random.seed(0)
    batch = collate_padded(samples, num_points=128, mix_prob=1.0)
    assert batch["coord"].shape[0] == 2  # pairs merged
    assert batch["mask"].sum() == 200


@pytest.fixture(scope="module")
def fake_dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gsdata")
    rng = np.random.default_rng(7)
    for split, n_scenes in [("train", 3), ("val", 2)]:
        for i in range(n_scenes):
            scene = root / split / f"scene{i:04d}"
            scene.mkdir(parents=True)
            n = int(rng.integers(300, 600))
            np.save(scene / "coord.npy", rng.normal(size=(n, 3)).astype(np.float32))
            np.save(scene / "color.npy", rng.uniform(0, 255, (n, 3)).astype(np.float32))
            np.save(scene / "quat.npy", rng.normal(size=(n, 4)).astype(np.float32))
            np.save(scene / "scale.npy", rng.uniform(0, 2, (n, 3)).astype(np.float32))
            np.save(scene / "opacity.npy", rng.uniform(0, 1, (n,)).astype(np.float32))
            np.save(scene / "segment.npy", rng.integers(-1, 10, n).astype(np.int16))
            np.save(scene / "lang_feat.npy", rng.normal(size=(n, 8)).astype(np.float16))
            np.save(scene / "valid_feat_mask.npy", (rng.random(n) > 0.4))
    return str(root)


TRAIN_TRANSFORM = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(
        type="GridSample",
        grid_size=0.05,
        hash_type="fnv",
        mode="train",
        keys=("coord", "color", "opacity", "quat", "scale", "segment",
              "lang_feat", "valid_feat_mask"),
        return_grid_coord=True,
    ),
    dict(type="SphereCrop", point_max=400, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="ToTensor"),
    dict(
        type="Collect",
        keys=("coord", "grid_coord", "segment", "lang_feat", "valid_feat_mask"),
        feat_keys=("color", "opacity", "quat", "scale"),
    ),
]


def test_gs_dataset_and_loader(fake_dataset_root):
    ds = build_dataset(
        dict(
            type="ScanNetPPGSDataset",
            split="train",
            data_root=fake_dataset_root,
            transform=TRAIN_TRANSFORM,
            loop=2,
        )
    )
    assert len(ds) == 6  # 3 scenes x loop 2
    sample = ds[0]
    assert sample["feat"].shape[1] == 11  # color3 + opacity1 + quat4 + scale3
    assert sample["coord"].shape[0] == sample["feat"].shape[0]
    assert sample["grid_coord"].min() >= 0

    loader = Loader(ds, batch_size=2, num_points=512, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["coord"].shape == (2, 512, 3)
        assert b["feat"].shape == (2, 512, 11)
        assert b["mask"].any(axis=1).all()


def test_loader_deterministic_across_worker_counts(fake_dataset_root):
    # augmentation draws are a pure function of (seed, epoch, sample index):
    # same seed -> identical batches regardless of thread count or scheduling
    ds = build_dataset(
        dict(
            type="ScanNetPPGSDataset",
            split="train",
            data_root=fake_dataset_root,
            transform=TRAIN_TRANSFORM,
            loop=2,
        )
    )

    def run(workers):
        loader = Loader(
            ds, batch_size=2, num_points=512, num_workers=workers, seed=7
        )
        loader.set_epoch(1)
        return list(loader)

    a, b, c = run(1), (run(4)), run(4)
    for ba, bb, bc in zip(a, b, c):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
            np.testing.assert_array_equal(ba[k], bc[k])


def test_multi_dataset_loader(fake_dataset_root):
    cfg = dict(
        type="ScanNetPPGSDataset",
        split="train",
        data_root=fake_dataset_root,
        transform=TRAIN_TRANSFORM,
    )
    concat = ConcatDataset(
        datasets=[dict(cfg, loop=2), dict(cfg, loop=1)],
    )
    loader = MultiDatasetLoader(concat, batch_size=1, num_points=512, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 9  # 3*2 + 3*1 scenes


def test_multi_dataset_loader_epoch_loop(fake_dataset_root):
    # the ConcatDataset's own loop multiplies data passes per epoch
    # (reference defaults.py:123: data.train.loop = epoch // eval_epoch)
    cfg = dict(
        type="ScanNetPPGSDataset",
        split="train",
        data_root=fake_dataset_root,
        transform=TRAIN_TRANSFORM,
    )
    concat = ConcatDataset(datasets=[dict(cfg), dict(cfg)], loop=3)
    loader = MultiDatasetLoader(concat, batch_size=1, num_points=512,
                                num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 3 * (3 + 3)


def test_hue_saturation_translation_roundtrip_and_range(rng):
    from scenesplat_tpu.data.transforms import (
        HueSaturationTranslation, _hsv_to_rgb, _rgb_to_hsv,
    )

    rgb = rng.uniform(0, 255, (500, 3))
    # hsv<->rgb roundtrip is exact (value channel carries the 0-255 scale)
    back = _hsv_to_rgb(_rgb_to_hsv(rgb))
    assert np.allclose(back, rgb, atol=1e-6)

    d = {"color": rgb.copy().astype(np.float32)}
    out = HueSaturationTranslation(hue_max=0.3, saturation_max=0.3)(d)
    c = out["color"]
    assert c.shape == (500, 3)
    assert (c >= 0).all() and (c <= 255).all()
    # hue rotation preserves the max channel (value) per pixel
    assert np.allclose(c.max(axis=1), rgb.max(axis=1), atol=1e-3)


def test_random_color_jitter(rng):
    from scenesplat_tpu.data.transforms import RandomColorJitter

    rgb = rng.uniform(0, 255, (400, 3)).astype(np.float32)
    t = RandomColorJitter(brightness=0.4, contrast=0.4, saturation=0.2,
                          hue=0.1, p=1.0)
    np.random.seed(3)
    out = t({"color": rgb.copy()})["color"]
    assert out.shape == rgb.shape
    assert (out >= 0).all() and (out <= 255).all()
    assert not np.allclose(out, rgb)
    # zero-strength jitter is the identity
    t0 = RandomColorJitter(p=1.0)
    assert np.allclose(t0({"color": rgb.copy()})["color"], rgb)


def test_gs_gaussian_blur_voxel_gpu_variant(rng):
    from scenesplat_tpu.data.transforms import GSGaussianBlurVoxelGPU

    n = 800
    coord = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    grid_coord = np.floor(coord / 0.05).astype(np.int32)
    color = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    t = GSGaussianBlurVoxelGPU(p=1.0, sigma=(1.0, 1.0))
    out = t({"grid_coord": grid_coord, "color": color.copy()})["color"]
    assert out.shape == color.shape
    assert np.isfinite(out).all()
    # blur moves colors toward local means but keeps them in range
    assert (out >= -1).all() and (out <= 256).all()
    assert not np.allclose(out, color)
    # constant color field is preserved under occupancy renormalization
    const = np.full_like(color, 100.0)
    out_c = t({"grid_coord": grid_coord, "color": const.copy()})["color"]
    assert np.allclose(out_c, 100.0, atol=1e-2)


def test_loader_multihost_slicing(fake_dataset_root):
    """Two process-sliced loaders must jointly reproduce exactly the
    single-process loader's batches: rows [0, B/2) on rank 0 and [B/2, B) on
    rank 1, with identical per-sample augmentation draws (seeded by GLOBAL
    sample index, so the split cannot change the data)."""
    from scenesplat_tpu.data import build_dataset
    from scenesplat_tpu.data.loader import Loader

    ds = build_dataset(dict(
        type="GenericGSDataset", split="train",
        data_root=str(fake_dataset_root),
        transform=[dict(type="GridSample", grid_size=0.1, mode="train",
                        keys=("coord", "color", "segment"),
                        return_grid_coord=True)],
    ))
    kw = dict(batch_size=2, num_points=512, seed=3, num_workers=2)
    full = list(Loader(ds, **kw))
    r0 = list(Loader(ds, process_index=0, process_count=2, **kw))
    r1 = list(Loader(ds, process_index=1, process_count=2, **kw))
    assert len(full) == len(r0) == len(r1)
    for fb, b0, b1 in zip(full, r0, r1):
        assert b0["coord"].shape[0] == 1 and b1["coord"].shape[0] == 1
        for k in ("coord", "grid_coord", "segment", "mask"):
            np.testing.assert_array_equal(fb[k][:1], b0[k])
            np.testing.assert_array_equal(fb[k][1:], b1[k])


def test_put_global_single_process_matches_device_put():
    import jax
    import jax.numpy as jnp

    from scenesplat_tpu.parallel.mesh import (
        batch_sharding, create_mesh, local_batch_slice, put_global,
    )

    mesh = create_mesh(len(jax.devices()))
    sharding = batch_sharding(mesh)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    a = put_global(x, sharding)
    b = jax.device_put(x, sharding)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.sharding == sharding
    assert local_batch_slice(8) == slice(0, 8)  # single process owns all
    # the multi-process branch's API, exercised at process_count == 1
    # (local rows == global rows): pins that this jax version supports it
    c = jax.make_array_from_process_local_data(sharding, x)
    np.testing.assert_array_equal(np.asarray(c), x)
    d = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        np.float32(0.5),
    )
    assert float(d) == 0.5  # replicated scalars (epoch_progress) work too
