"""Full-model MinkUNet forward golden vs the reference MinkowskiEngine
MinkUNet through the executable ME stand-in (tests/me_stub.py), weights via
utils/ckpt_bridge.convert_mink_checkpoint. Covers both block types
(MinkUNet14 basic, MinkUNet50-style bottleneck mini)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.me_stub import install_me_stub  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mink():
    install_executable_stubs()
    install_me_stub()
    mod = load_reference_package("pointcept.models.sparse_unet.mink_unet")
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


@pytest.mark.parametrize("variant", ["MinkUNet14", "MinkUNet50"])
def test_mink_forward_matches_reference(ref_mink, variant):
    rng = np.random.default_rng(37)
    coord, grid, _ = _make_scene(rng, n_parents=16, levels=4)
    n = len(grid)
    in_c, out_c = 4, 5
    feat = rng.normal(size=(n, in_c)).astype(np.float32)

    ref_cls = getattr(ref_mink, variant)
    model = ref_cls(in_channels=in_c, out_channels=out_c, dimension=3)
    model.eval()
    with torch.no_grad():
        ref_out = model(dict(
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
        )).numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_mink_checkpoint

    ours_model = build_model(dict(
        type=variant, in_channels=in_c, out_channels=out_c,
        stage_capacity=(0.5, 0.25, 0.125, 0.0625),
    ))
    pb = PointBatch(
        coord=jnp.asarray(grid, jnp.float32)[None] * 0.02,
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, report = convert_mink_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False
    )
    ours = np.asarray(out.feat[0], np.float32)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["MinkUNet14", "MinkUNet50"])
def test_mink_gradients_match_reference(ref_mink, variant):
    """Backward-pass parity (basic + bottleneck blocks): param grads vs
    torch autograd through the ME stand-in, mapped through the weight
    bridge (linear relayouts commute with differentiation)."""
    rng = np.random.default_rng(73)
    coord, grid, _ = _make_scene(rng, n_parents=16, levels=4)
    n = len(grid)
    in_c, out_c = 4, 5
    feat = rng.normal(size=(n, in_c)).astype(np.float32)
    w_out = rng.normal(size=(out_c,)).astype(np.float32)

    ref_cls = getattr(ref_mink, variant)
    model = ref_cls(in_channels=in_c, out_channels=out_c, dimension=3)
    model.eval()
    out = model(dict(
        grid_coord=torch.from_numpy(grid).int(),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    ))
    (out * torch.from_numpy(w_out)).sum().backward()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in model.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_mink_checkpoint

    ours_model = build_model(dict(
        type=variant, in_channels=in_c, out_channels=out_c,
        stage_capacity=(0.5, 0.25, 0.125, 0.0625),
    ))
    pb = PointBatch(
        coord=jnp.asarray(grid, jnp.float32)[None] * 0.02,
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, _ = convert_mink_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(jax.tree_util.tree_map(jnp.asarray, params))
    zero_template = jax.tree_util.tree_map(np.zeros_like, params)
    mapped_grads, _, report = convert_mink_checkpoint(
        grads_t, zero_template, {}, backbone_prefix="",
    )
    assert report["filled_leaves"] > 30
    flat_ours = {
        "/".join(str(q) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(ours_grads)[0]
    }
    flat_ref = {
        "/".join(str(q) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(mapped_grads)[0]
    }
    checked = 0
    for key, g_ref in flat_ref.items():
        if not np.any(g_ref):
            continue
        scale = max(np.abs(g_ref).max(), 1e-3)
        np.testing.assert_allclose(
            flat_ours[key] / scale, g_ref / scale, rtol=5e-3, atol=5e-4,
            err_msg=f"gradient mismatch at {key}",
        )
        checked += 1
    assert checked > 30
