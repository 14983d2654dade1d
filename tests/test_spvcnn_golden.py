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
