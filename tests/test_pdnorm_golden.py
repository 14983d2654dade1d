"""SpUNet-v1m3 (PDNorm) forward golden: per-condition norms + adaptive
context modulation vs the reference spconv_unet_v1m3_pdnorm through the
executable spconv stand-ins; weights via
utils/ckpt_bridge.convert_spunet_v1m3_checkpoint. Checked for BOTH
conditions to prove the per-condition norm selection."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402

torch = pytest.importorskip("torch")

MINI = dict(
    in_channels=4,
    num_classes=5,
    base_channels=8,
    channels=(8, 16, 16, 8),
    layers=(1, 1, 1, 1),
)
CONDITIONS = ("CondA", "CondB")


@pytest.fixture(scope="module")
def ref_v1m3():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.sparse_unet.spconv_unet_v1m3_pdnorm"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


@pytest.mark.parametrize("cond_idx", [0, 1])
def test_v1m3_forward_matches_reference(ref_v1m3, cond_idx):
    rng = np.random.default_rng(47 + cond_idx)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)
    context = rng.normal(size=(1, 256)).astype(np.float32)

    model = ref_v1m3.SpUNetBase(
        **MINI, conditions=CONDITIONS, zero_init=False,
        norm_decouple=True, norm_adaptive=True, norm_affine=False,
    )
    model.eval()
    # give the running stats + modulation non-trivial values so the
    # per-condition selection and the adaptive affine actually discriminate
    with torch.no_grad():
        g = torch.Generator().manual_seed(7 + cond_idx)
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(1.0 + 0.1 * torch.rand(buf.shape, generator=g))
        ref_out = model(dict(
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
            condition=[CONDITIONS[cond_idx]],
            context=torch.from_numpy(context),
        )).numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import (
        convert_spunet_v1m3_checkpoint,
    )

    ours_model = build_model(dict(
        type="SpUNet-v1m3", **MINI, conditions=CONDITIONS,
        pd_adaptive=True, stage_capacity=(0.5, 0.25),
    ))
    pb = PointBatch(
        coord=jnp.asarray(grid, jnp.float32)[None] * 0.02,
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    cidx = jnp.asarray(cond_idx, jnp.int32)
    ctx = jnp.asarray(context)
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False,
        condition_index=cidx, context=ctx,
    )
    params, batch_stats, report = convert_spunet_v1m3_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        num_conditions=len(CONDITIONS), backbone_prefix="",
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False,
        condition_index=cidx, context=ctx,
    )
    ours = np.asarray(out.feat[0], np.float32)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


def test_v1m3_gradients_match_reference(ref_v1m3):
    """Backward-pass parity through the per-condition norm selection and
    the adaptive context modulation (reference
    spconv_unet_v1m3_pdnorm.py PDNorm/SpUNetBase)."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads

    cond_idx = 1
    rng = np.random.default_rng(91)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)
    context = rng.normal(size=(1, 256)).astype(np.float32)
    w_out = rng.normal(size=(MINI["num_classes"],)).astype(np.float32)

    model = ref_v1m3.SpUNetBase(
        **MINI, conditions=CONDITIONS, zero_init=False,
        norm_decouple=True, norm_adaptive=True, norm_affine=False,
    )
    model.eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(8)
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(1.0 + 0.1 * torch.rand(buf.shape, generator=g))
    out = model(dict(
        grid_coord=torch.from_numpy(grid).int(),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
        condition=[CONDITIONS[cond_idx]],
        context=torch.from_numpy(context),
    ))
    (out * torch.from_numpy(w_out)).sum().backward()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in model.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import (
        convert_spunet_v1m3_checkpoint,
    )

    ours_model = build_model(dict(
        type="SpUNet-v1m3", **MINI, conditions=CONDITIONS,
        pd_adaptive=True, stage_capacity=(0.5, 0.25),
    ))
    pb = PointBatch(
        coord=jnp.asarray(grid, jnp.float32)[None] * 0.02,
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    cidx = jnp.asarray(cond_idx, jnp.int32)
    ctx = jnp.asarray(context)
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False,
        condition_index=cidx, context=ctx,
    )
    params, batch_stats, _ = convert_spunet_v1m3_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        num_conditions=len(CONDITIONS), backbone_prefix="",
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False,
            condition_index=cidx, context=ctx,
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_spunet_v1m3_checkpoint,
        min_checked=20, num_conditions=len(CONDITIONS), backbone_prefix="",
    )
