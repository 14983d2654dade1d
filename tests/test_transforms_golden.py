"""Golden tests: our numpy transforms vs the reference implementations
(pointcept/datasets/transform.py), for the deterministic / determinizable
transforms. Random transforms draw from different RNG streams by design and
are covered by semantic tests in test_data.py.
"""

import copy

import numpy as np
import pytest

from conftest import load_reference_package

from scenesplat_tpu.data import transforms as ours

_REF = load_reference_package("pointcept.datasets.transform")
pytestmark = pytest.mark.skipif(
    _REF is None, reason="reference transforms unavailable"
)


def scene(rng, n=600, extent=4.0):
    return {
        "coord": (rng.normal(size=(n, 3)) * extent).astype(np.float32),
        "color": rng.uniform(0, 255, (n, 3)).astype(np.float32),
        "segment": rng.integers(0, 10, n).astype(np.int64),
        "quat": rng.normal(size=(n, 4)).astype(np.float32),
        "scale": rng.uniform(1e-3, 0.5, (n, 3)).astype(np.float32),
        "opacity": rng.uniform(0, 1, (n, 1)).astype(np.float32),
    }


def _both(rng, ref_t, our_t, keys=("coord", "color")):
    d = scene(rng)
    ref_out = ref_t(copy.deepcopy(d))
    our_out = our_t(copy.deepcopy(d))
    for k in keys:
        np.testing.assert_allclose(
            np.asarray(our_out[k]), np.asarray(ref_out[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_center_shift_golden(rng):
    _both(rng, _REF.CenterShift(apply_z=True), ours.CenterShift(apply_z=True),
          keys=("coord",))
    _both(rng, _REF.CenterShift(apply_z=False),
          ours.CenterShift(apply_z=False), keys=("coord",))


def test_positive_shift_golden(rng):
    _both(rng, _REF.PositiveShift(), ours.PositiveShift(), keys=("coord",))


def test_normalize_color_golden(rng):
    _both(rng, _REF.NormalizeColor(), ours.NormalizeColor(), keys=("color",))


def test_normalize_coord_golden(rng):
    _both(rng, _REF.NormalizeCoord(), ours.NormalizeCoord(), keys=("coord",))


def test_point_clip_golden(rng):
    bound = (-2, -2, -2, 2, 2, 2)
    d = scene(rng)
    ref_out = _REF.PointClip(point_cloud_range=bound)(copy.deepcopy(d))
    our_out = ours.PointClip(point_cloud_range=bound)(copy.deepcopy(d))
    np.testing.assert_allclose(our_out["coord"], ref_out["coord"],
                               rtol=1e-6, atol=1e-6)


def test_random_rotate_fixed_angle_golden(rng):
    # degenerate angle interval makes the rotation deterministic; quats
    # must transform identically (left-multiply, transform.py:582-595)
    ref_t = _REF.RandomRotate(angle=[0.37, 0.37], axis="z", p=1.0,
                              center=[0, 0, 0])
    our_t = ours.RandomRotate(angle=[0.37, 0.37], axis="z", p=1.0,
                              center=[0, 0, 0])
    d = scene(rng)
    ref_out = ref_t(copy.deepcopy(d))
    our_out = our_t(copy.deepcopy(d))
    np.testing.assert_allclose(our_out["coord"], ref_out["coord"],
                               rtol=1e-4, atol=1e-4)
    # quaternions are sign-ambiguous: compare rotation matrices
    rq = np.asarray(ref_out["quat"], np.float64)
    oq = np.asarray(our_out["quat"], np.float64)
    np.testing.assert_allclose(
        ours._quat_wxyz_to_matrix(oq), ours._quat_wxyz_to_matrix(rq),
        rtol=1e-4, atol=1e-4,
    )


def test_random_scale_fixed_golden(rng):
    ref_t = _REF.RandomScale(scale=[1.3, 1.3])
    our_t = ours.RandomScale(scale=[1.3, 1.3])
    d = scene(rng)
    ref_out = ref_t(copy.deepcopy(d))
    our_out = our_t(copy.deepcopy(d))
    np.testing.assert_allclose(our_out["coord"], ref_out["coord"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(our_out["scale"], ref_out["scale"],
                               rtol=1e-5, atol=1e-5)


def test_sphere_crop_center_golden(rng):
    ref_t = _REF.SphereCrop(point_max=200, mode="center")
    our_t = ours.SphereCrop(point_max=200, mode="center")
    d = scene(rng)
    ref_out = ref_t(copy.deepcopy(d))
    our_out = our_t(copy.deepcopy(d))
    assert our_out["coord"].shape == ref_out["coord"].shape
    # same point set (order may differ: both take the k nearest to the
    # median-ish center point)
    ref_set = {tuple(r) for r in np.round(ref_out["coord"], 5).tolist()}
    our_set = {tuple(r) for r in np.round(our_out["coord"], 5).tolist()}
    assert ref_set == our_set


def test_grid_sample_test_mode_golden(rng):
    # mode="test" is deterministic: complementary fragments, each covering
    # every occupied voxel once (transform.py:1302-1330)
    d = scene(rng, n=800)
    gs_keys = ("coord", "color", "segment")
    ref_t = _REF.GridSample(grid_size=0.8, mode="test", keys=gs_keys,
                            return_grid_coord=True)
    our_t = ours.GridSample(grid_size=0.8, mode="test", keys=gs_keys,
                            return_grid_coord=True)
    ref_frags = ref_t(copy.deepcopy(d))
    our_frags = our_t(copy.deepcopy(d))
    assert len(our_frags) == len(ref_frags)
    for rf, of in zip(ref_frags, our_frags):
        ri = np.sort(np.asarray(rf["index"]).reshape(-1))
        oi = np.sort(np.asarray(of["index"]).reshape(-1))
        np.testing.assert_array_equal(oi, ri)
        # grid coords of the matching points agree
        order_r = np.argsort(np.asarray(rf["index"]).reshape(-1))
        order_o = np.argsort(np.asarray(of["index"]).reshape(-1))
        np.testing.assert_array_equal(
            np.asarray(of["grid_coord"])[order_o],
            np.asarray(rf["grid_coord"])[order_r],
        )


def test_chromatic_auto_contrast_golden(rng):
    d = scene(rng)
    ref_out = _REF.ChromaticAutoContrast(p=1.0, blend_factor=0.6)(
        copy.deepcopy(d)
    )
    our_out = ours.ChromaticAutoContrast(p=1.0, blend_factor=0.6)(
        copy.deepcopy(d)
    )
    np.testing.assert_allclose(our_out["color"], ref_out["color"],
                               rtol=1e-5, atol=1e-4)


def test_random_color_grayscale_golden(rng):
    d = scene(rng)
    ref_out = _REF.RandomColorGrayScale(p=1.0)(copy.deepcopy(d))
    our_out = ours.RandomColorGrayScale(p=1.0)(copy.deepcopy(d))
    np.testing.assert_allclose(our_out["color"], ref_out["color"],
                               rtol=1e-5, atol=1e-4)


def test_instance_parser_golden(rng):
    n = 500
    d = scene(rng, n=n)
    d["instance"] = rng.integers(-1, 8, n).astype(np.int64)
    d["segment"] = rng.integers(-1, 6, n).astype(np.int64)
    ref_out = _REF.InstanceParser(segment_ignore_index=(-1, 0, 1))(
        copy.deepcopy(d)
    )
    our_out = ours.InstanceParser(segment_ignore_index=(-1, 0, 1))(
        copy.deepcopy(d)
    )
    np.testing.assert_array_equal(our_out["instance"], ref_out["instance"])
    np.testing.assert_allclose(our_out["instance_centroid"],
                               ref_out["instance_centroid"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(our_out["bbox"], ref_out["bbox"],
                               rtol=1e-5, atol=1e-5)


def test_gs_gaussian_blur_voxel_golden(rng):
    n = 700
    d = scene(rng, n=n)
    d["grid_coord"] = rng.integers(0, 14, (n, 3)).astype(np.int32)
    d["opacity"] = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    kwargs = dict(p=1.0, sigma=[0.7, 0.7],
                  extra_keys=("opacity", "scale", "quat"))
    ref_out = _REF.GSGaussianBlurVoxelOpc(**kwargs)(copy.deepcopy(d))
    our_out = ours.GSGaussianBlurVoxelOpc(**kwargs)(copy.deepcopy(d))
    for k in ("color", "opacity", "scale", "quat"):
        np.testing.assert_allclose(
            np.asarray(our_out[k]), np.asarray(ref_out[k]),
            rtol=1e-4, atol=1e-3, err_msg=k,
        )


def test_grid_sample_importance_golden(rng):
    # importance sampling picks the per-cell argmax of the importance
    # attribute — fully deterministic (transform.py:1334-1380)
    d = scene(rng, n=800)
    gs_keys = ("coord", "color", "segment", "scale")
    kw = dict(grid_size=0.8, mode="train", keys=gs_keys,
              return_grid_coord=True,
              importance_sample_key=("scale_max", "opacity"))
    d["opacity"] = rng.uniform(0, 1, (len(d["coord"]),)).astype(np.float32)
    ref_out = _REF.GridSample(**kw)(copy.deepcopy(d))
    our_out = ours.GridSample(**kw)(copy.deepcopy(d))
    ref_set = {tuple(r) for r in np.round(ref_out["coord"], 5).tolist()}
    our_set = {tuple(r) for r in np.round(our_out["coord"], 5).tolist()}
    assert ref_set == our_set


def test_grid_sample_sampled_index_golden(rng):
    # ScanNet data-efficient: labeled points are always kept, and
    # sampled_index is re-expressed in the surviving point numbering
    # (reference transform.py:1273-1280). Importance sampling makes the
    # per-cell pick deterministic so both sides select identical points.
    n = 800
    d = scene(rng, n=n)
    d["sampled_index"] = np.sort(
        rng.choice(n, size=40, replace=False)
    ).astype(np.int64)
    gs_keys = ("coord", "color", "segment")
    kw = dict(grid_size=0.8, mode="train", keys=gs_keys,
              return_grid_coord=True, importance_sample_key=("opacity",))
    d["opacity"] = rng.uniform(0, 1, (n,)).astype(np.float32)
    ref_out = _REF.GridSample(**kw)(copy.deepcopy(d))
    our_out = ours.GridSample(**kw)(copy.deepcopy(d))
    np.testing.assert_allclose(our_out["coord"], ref_out["coord"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(our_out["sampled_index"],
                                  ref_out["sampled_index"])
    # the labeled points really survived
    np.testing.assert_allclose(
        our_out["coord"][our_out["sampled_index"]],
        d["coord"][d["sampled_index"]], rtol=1e-6, atol=1e-6)


def test_grid_sample_test_mode_displacement_golden(rng):
    d = scene(rng, n=400)
    d["normal"] = rng.normal(size=(400, 3)).astype(np.float32)
    gs_keys = ("coord", "color")
    kw = dict(grid_size=0.8, mode="test", keys=gs_keys,
              return_displacement=True, project_displacement=True)
    ref_frags = _REF.GridSample(**kw)(copy.deepcopy(d))
    our_frags = ours.GridSample(**kw)(copy.deepcopy(d))
    assert len(our_frags) == len(ref_frags)
    for rf, of in zip(ref_frags, our_frags):
        np.testing.assert_array_equal(of["index"], rf["index"])
        np.testing.assert_allclose(
            np.asarray(of["displacement"]), np.asarray(rf["displacement"]),
            rtol=1e-5, atol=1e-6)


def test_grid_sample_train_mode_structure_golden(rng):
    # train mode picks a random point per voxel — the picked points differ
    # by RNG, but the voxel partition must be identical: compare the SET of
    # occupied voxels and the per-voxel counts implied by grid_coord
    d = scene(rng, n=800)
    gs_keys = ("coord", "color", "segment")
    ref_t = _REF.GridSample(grid_size=0.8, mode="train", keys=gs_keys,
                            return_grid_coord=True)
    our_t = ours.GridSample(grid_size=0.8, mode="train", keys=gs_keys,
                            return_grid_coord=True)
    ref_out = ref_t(copy.deepcopy(d))
    our_out = our_t(copy.deepcopy(d))
    rg = np.asarray(ref_out["grid_coord"])
    og = np.asarray(our_out["grid_coord"])
    assert rg.shape == og.shape  # one point per occupied voxel
    ref_cells = {tuple(r) for r in rg.tolist()}
    our_cells = {tuple(r) for r in og.tolist()}
    assert ref_cells == our_cells
