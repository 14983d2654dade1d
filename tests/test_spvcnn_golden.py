"""Full-model SPVCNN forward golden vs the reference torchsparse SPVCNN
through the executable torchsparse stand-in (tests/ts_stub.py), weights via
utils/ckpt_bridge.convert_spvcnn_checkpoint."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402
from tests.ts_stub import install_torchsparse_stub  # noqa: E402

torch = pytest.importorskip("torch")

MINI = dict(
    in_channels=4,
    out_channels=5,
    base_channels=8,
    channels=(8, 8, 8, 8, 8, 8, 8, 8),
    layers=(1, 1, 1, 1, 1, 1, 1, 1),
)


@pytest.fixture(scope="module")
def ref_spvcnn():
    install_executable_stubs()
    install_torchsparse_stub()
    mod = load_reference_package("pointcept.models.spvcnn.ts_spvcnn")
    if mod is None:
        pytest.skip("reference repo unavailable")
    if getattr(mod, "torchsparse", None) is None:
        pytest.skip("torchsparse stub failed to bind")
    return mod


def test_spvcnn_forward_matches_reference(ref_spvcnn):
    rng = np.random.default_rng(33)
    coord, grid, _ = _make_scene(rng, n_parents=16, levels=4)
    n = len(grid)
    assert n == 256
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)

    model = ref_spvcnn.SPVCNN(**MINI)
    model.eval()
    with torch.no_grad():
        ref_out = model(dict(
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
        )).numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_spvcnn_checkpoint

    ours_model = build_model(dict(
        type="SPVCNN", **MINI,
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
    params, batch_stats, report = convert_spvcnn_checkpoint(
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


def _compare_bridge_mapped_grads(ours_grads, grads_t, params, converter,
                                 min_checked=20, rtol=5e-3, atol=5e-4,
                                 **conv_kwargs):
    """Shared check: map torch grads through the weight bridge (linear
    relayouts commute with differentiation) and compare leaf-by-leaf."""
    import jax
    zero_template = jax.tree_util.tree_map(np.zeros_like, params)
    mapped, _, report = converter(grads_t, zero_template, {}, **conv_kwargs)
    assert report["filled_leaves"] >= min_checked
    flat_ours = {
        "/".join(str(q) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(ours_grads)[0]
    }
    flat_ref = {
        "/".join(str(q) for q in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(mapped)[0]
    }
    checked = 0
    for key, g_ref in flat_ref.items():
        if not np.any(g_ref):
            continue
        scale = max(np.abs(g_ref).max(), 1e-3)
        np.testing.assert_allclose(
            flat_ours[key] / scale, g_ref / scale, rtol=rtol, atol=atol,
            err_msg=f"gradient mismatch at {key}",
        )
        checked += 1
    assert checked >= min_checked


def test_spvcnn_gradients_match_reference(ref_spvcnn):
    """Backward-pass parity for the point-voxel stack (sparse convs +
    point transforms + voxel<->point interpolation)."""
    rng = np.random.default_rng(71)
    coord, grid, _ = _make_scene(rng, n_parents=16, levels=4)
    n = len(grid)
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)
    w_out = rng.normal(size=(MINI["out_channels"],)).astype(np.float32)

    model = ref_spvcnn.SPVCNN(**MINI)
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
    from scenesplat_tpu.utils.ckpt_bridge import convert_spvcnn_checkpoint

    ours_model = build_model(dict(
        type="SPVCNN", **MINI,
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
    params, batch_stats, _ = convert_spvcnn_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    import jax as _jax
    ours_grads = _jax.grad(loss_fn)(
        _jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_spvcnn_checkpoint,
        min_checked=30, backbone_prefix="",
    )
