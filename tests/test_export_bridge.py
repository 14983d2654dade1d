"""Reverse checkpoint bridge: flax -> torch .pth export.

Proves models trained HERE migrate back to the reference stack:
1. Round-trip — export_ptv3_lang_checkpoint then convert_ptv3_lang_checkpoint
   reproduces the flax params/batch_stats bit-exactly with zero unused keys.
2. Reference-loadable — the exported dict satisfies the reference torch
   PTv3's ``load_state_dict(strict=True)`` (point_transformer_v3m1_base.py:518
   key layout, executed through tests/ref_exec_stubs.py) and the torch
   forward then matches the flax forward that produced the weights.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import MINI, _make_scene  # noqa: E402

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_ptv3():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_transformer_v3.point_transformer_v3m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


def _init_flax(coord, grid, feat, cfg, stage_capacity, seed=7):
    from scenesplat_tpu.models import PointBatch, build_model

    model = build_model(dict(
        type="PT-v3m1", **cfg, upcast_softmax=True, use_pallas=False,
        stage_capacity=stage_capacity,
    ))
    point = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, len(coord)), bool),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "shuffle": jax.random.PRNGKey(1)},
        point, train=False,
    )
    return model, point, variables


def test_export_round_trips_bit_exact():
    from scenesplat_tpu.utils.ckpt_bridge import (
        convert_ptv3_lang_checkpoint,
        export_ptv3_lang_checkpoint,
    )

    rng = np.random.default_rng(3)
    coord, grid, feat = _make_scene(rng)
    _, _, variables = _init_flax(coord, grid, feat, MINI, (0.5,))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )

    state = export_ptv3_lang_checkpoint(
        params, stats, backbone_prefix="", flax_backbone_key="")
    back_p, back_s, report = convert_ptv3_lang_checkpoint(
        state, params, stats, backbone_prefix="", flax_backbone_key="")

    leftovers = [k for k in report["unused_torch_keys"]
                 if "num_batches_tracked" not in k]
    assert leftovers == [], f"export emitted keys the import rejects: {leftovers}"
    n_leaves = len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(stats))
    assert report["filled_leaves"] == n_leaves

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(back_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_state_loads_strict_and_matches(ref_ptv3):
    from scenesplat_tpu.utils.ckpt_bridge import export_ptv3_lang_checkpoint

    rng = np.random.default_rng(11)
    coord, grid, feat = _make_scene(rng)
    model, point, variables = _init_flax(coord, grid, feat, MINI, (0.5,))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )
    ours = np.asarray(
        model.apply({"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})},
                    point, train=False).feat[0],
        np.float32,
    )

    state = export_ptv3_lang_checkpoint(
        params, stats, backbone_prefix="", flax_backbone_key="")

    ref_model = ref_ptv3.PointTransformerV3(
        **MINI, enable_flash=False, upcast_attention=True,
        upcast_softmax=True,
    )
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()},
        strict=True,
    )
    assert not missing and not unexpected
    ref_model.eval()
    for m in ref_model.modules():
        if isinstance(m, ref_ptv3.SerializedPooling):
            m.shuffle_orders = False
    data = dict(
        coord=torch.from_numpy(coord),
        grid_coord=torch.from_numpy(grid).int(),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([len(coord)]),
        grid_size=torch.tensor(0.02),
    )
    with torch.no_grad():
        ref_out = ref_model(data).feat.numpy()

    assert ref_out.shape == ours.shape
    np.testing.assert_allclose(ref_out, ours, rtol=1e-4, atol=2e-4)


SPUNET_MINI = dict(
    in_channels=4,
    num_classes=5,
    base_channels=8,
    channels=(8, 16, 16, 8),
    layers=(1, 1, 1, 1),
)


@pytest.fixture(scope="module")
def ref_spunet():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.sparse_unet.spconv_unet_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


def test_spunet_export_loads_strict_and_matches(ref_spunet):
    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import (
        convert_spunet_checkpoint,
        export_spunet_checkpoint,
    )

    rng = np.random.default_rng(5)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, SPUNET_MINI["in_channels"])).astype(np.float32)

    model = build_model(dict(
        type="SpUNet-v1m1", **SPUNET_MINI, stage_capacity=(0.5, 0.25),
    ))
    pb = PointBatch(
        coord=jnp.asarray(grid, jnp.float32)[None] * 0.02,
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = model.init({"params": jax.random.PRNGKey(4)}, pb, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {}))
    ours = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, pb,
                    train=False).feat[0], np.float32)

    state = export_spunet_checkpoint(params, stats, backbone_prefix="")

    # round trip through the import bridge: bit-exact, all leaves filled
    back_p, back_s, report = convert_spunet_checkpoint(
        state, params, stats, backbone_prefix="")
    leftovers = [k for k in report["unused_torch_keys"]
                 if "num_batches_tracked" not in k]
    assert leftovers == []
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(back_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # strict load into the reference's own torch SpUNet + forward parity
    ref_model = ref_spunet.SpUNetBase(**SPUNET_MINI)
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()},
        strict=True,
    )
    assert not missing and not unexpected
    ref_model.eval()
    with torch.no_grad():
        ref_out = ref_model(dict(
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
        )).numpy()
    assert ref_out.shape == ours.shape
    np.testing.assert_allclose(ref_out, ours, rtol=1e-4, atol=1e-4)
