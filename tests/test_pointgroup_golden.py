"""PointGroup forward golden: seg logits + offset-bias predictions vs the
reference PG-v1m1 heads (captured by hooks — the reference forward bundles
losses), weights via utils/ckpt_bridge.convert_pointgroup_checkpoint."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402

torch = pytest.importorskip("torch")

BACKBONE = dict(
    type="SpUNet-v1m1", in_channels=4, num_classes=0, base_channels=8,
    channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
)


def test_pointgroup_heads_match_reference():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_group.point_group_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(43)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    segment = rng.integers(0, 5, size=n).astype(np.int64)
    instance = rng.integers(0, 8, size=n).astype(np.int64)

    model = mod.PointGroup(
        backbone=dict(type="SpUNet-v1m1", in_channels=4, num_classes=0,
                      base_channels=8, channels=(8, 16, 16, 8),
                      layers=(1, 1, 1, 1)),
        backbone_out_channels=8, semantic_num_classes=5,
    )
    model.eval()
    caps = {}

    class _Captured(Exception):
        pass

    model.bias_head.register_forward_hook(
        lambda m, i, o: caps.__setitem__("bias", o.detach().numpy().copy()))

    def _grab_and_abort(m, i, o):
        # the reference eval path continues into the CUDA-only
        # pointgroup_ops clustering (l.104-160) — capture the head outputs
        # and abort the forward there
        caps["logits"] = o.detach().numpy().copy()
        raise _Captured

    model.seg_head.register_forward_hook(_grab_and_abort)
    with torch.no_grad():
        try:
            model(dict(
                coord=torch.from_numpy(coord),
                grid_coord=torch.from_numpy(grid).int(),
                feat=torch.from_numpy(feat),
                segment=torch.from_numpy(segment),
                instance=torch.from_numpy(instance),
                instance_centroid=torch.zeros(n, 3),
                offset=torch.tensor([n]),
            ))
        except _Captured:
            pass
    assert "logits" in caps and "bias" in caps
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_pointgroup_checkpoint

    ours_model = build_model(dict(
        type="PG-v1m1",
        backbone=dict(BACKBONE, stage_capacity=(0.5, 0.25)),
        backbone_out_channels=8, semantic_num_classes=5,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, report = convert_pointgroup_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out, bias_pred = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False
    )
    np.testing.assert_allclose(
        np.asarray(out.feat[0], np.float32), caps["logits"],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(bias_pred[0], np.float32), caps["bias"],
        rtol=1e-4, atol=1e-4,
    )


def test_pointgroup_gradients_match_reference():
    """Backward parity through both heads + the shared SpUNet backbone;
    the live (non-detached) head outputs are captured by hooks and the
    forward aborted before the CUDA-only clustering, then backward runs
    on a weighted sum of both."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads

    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_group.point_group_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(47)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    w_seg = rng.normal(size=(5,)).astype(np.float32)
    w_bias = rng.normal(size=(3,)).astype(np.float32)

    model = mod.PointGroup(
        backbone=dict(type="SpUNet-v1m1", in_channels=4, num_classes=0,
                      base_channels=8, channels=(8, 16, 16, 8),
                      layers=(1, 1, 1, 1)),
        backbone_out_channels=8, semantic_num_classes=5,
    )
    model.eval()
    caps = {}

    class _Captured(Exception):
        pass

    model.bias_head.register_forward_hook(
        lambda m, i, o: caps.__setitem__("bias", o))

    def _grab_and_abort(m, i, o):
        caps["logits"] = o
        raise _Captured

    model.seg_head.register_forward_hook(_grab_and_abort)
    try:
        model(dict(
            coord=torch.from_numpy(coord),
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            segment=torch.zeros(n, dtype=torch.long),
            instance=torch.zeros(n, dtype=torch.long),
            instance_centroid=torch.zeros(n, 3),
            offset=torch.tensor([n]),
        ))
    except _Captured:
        pass
    loss_t = (caps["logits"] * torch.from_numpy(w_seg)).sum() \
        + (caps["bias"] * torch.from_numpy(w_bias)).sum()
    loss_t.backward()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in model.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_pointgroup_checkpoint

    ours_model = build_model(dict(
        type="PG-v1m1",
        backbone=dict(BACKBONE, stage_capacity=(0.5, 0.25)),
        backbone_out_channels=8, semantic_num_classes=5,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, _ = convert_pointgroup_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
    )

    def loss_fn(p):
        out, bias_pred = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False
        )
        return (out.feat[0] * jnp.asarray(w_seg)).sum() \
            + (bias_pred[0] * jnp.asarray(w_bias)).sum()

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_pointgroup_checkpoint,
        min_checked=25,
    )
