"""Full-model CAC (context-aware classifier) eval-forward golden vs the
reference torch CACSegmentor over a SpUNet backbone, through the executable
spconv stand-ins; weights via utils/ckpt_bridge.convert_cac_checkpoint.
Covers the prototype-refinement head (post_refine_proto_batch +
feat_proj_layer + cosine scoring at cos_temp)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402

torch = pytest.importorskip("torch")

BACKBONE = dict(
    type="SpUNet-v1m1",
    in_channels=4,
    num_classes=0,
    base_channels=8,
    channels=(8, 16, 16, 8),
    layers=(1, 1, 1, 1),
)


@pytest.fixture(scope="module")
def ref_cac():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.context_aware_classifier."
        "context_aware_classifier_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


def test_cac_eval_forward_matches_reference(ref_cac, monkeypatch):
    rng = np.random.default_rng(41)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)

    # the reference head allocates a cuda tensor only on the train path;
    # eval path is cuda-free
    model = ref_cac.CACSegmentor(
        num_classes=5, backbone_out_channels=BACKBONE["channels"][-1],
        backbone=dict(type="SpUNet-v1m1", in_channels=4, num_classes=0,
                      base_channels=8, channels=(8, 16, 16, 8),
                      layers=(1, 1, 1, 1)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        cos_temp=15.0, conf_thresh=0.5,
    )
    model.eval()
    with torch.no_grad():
        out = model(dict(
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
        ))
        ref_logits = out["seg_logits"].numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_cac_checkpoint

    ours_model = build_model(dict(
        type="CAC-v1m1", num_classes=5,
        backbone_out_channels=BACKBONE["channels"][-1],
        backbone=dict(BACKBONE, stage_capacity=(0.5, 0.25)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        cos_temp=15.0, conf_thresh=0.5,
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
    params, batch_stats, report = convert_cac_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False
    )
    ours = np.asarray(out.feat[0], np.float32)
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-4, atol=1e-4)


def test_cac_gradients_match_reference(ref_cac):
    """Backward parity through the prototype-refinement head (cosine
    scoring, proto refinement MLPs) + the SpUNet backbone on the eval
    forward path."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads

    rng = np.random.default_rng(53)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    w_out = rng.normal(size=(5,)).astype(np.float32)

    model = ref_cac.CACSegmentor(
        num_classes=5, backbone_out_channels=BACKBONE["channels"][-1],
        backbone=dict(type="SpUNet-v1m1", in_channels=4, num_classes=0,
                      base_channels=8, channels=(8, 16, 16, 8),
                      layers=(1, 1, 1, 1)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        cos_temp=15.0, conf_thresh=0.5,
    )
    model.eval()
    out = model(dict(
        grid_coord=torch.from_numpy(grid).int(),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    ))
    (out["seg_logits"] * torch.from_numpy(w_out)).sum().backward()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in model.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_cac_checkpoint

    ours_model = build_model(dict(
        type="CAC-v1m1", num_classes=5,
        backbone_out_channels=BACKBONE["channels"][-1],
        backbone=dict(BACKBONE, stage_capacity=(0.5, 0.25)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        cos_temp=15.0, conf_thresh=0.5,
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
    params, batch_stats, _ = convert_cac_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_cac_checkpoint,
        min_checked=25,
    )
