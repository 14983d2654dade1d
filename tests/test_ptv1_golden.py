"""Full-model PTv1 (PointTransformerSeg) forward golden vs the reference
torch model through executable pointops stand-ins (FPS, kNN, grouping,
interpolation), weights via utils/ckpt_bridge.convert_ptv1_checkpoint.

N is chosen so every FPS level keeps >= nsample points (the reference's
unmasked attention would otherwise attend zero-padded -1 slots, a
protocol our masked attention deliberately does not replicate)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_ptv1():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_transformer.point_transformer_seg"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


def test_ptv1_forward_matches_reference(ref_ptv1):
    rng = np.random.default_rng(13)
    n = 4096  # coarsest level: n // 256 = 16 = nsample
    coord = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 6)).astype(np.float32)

    model = ref_ptv1.PointTransformerSeg(
        ref_ptv1.Bottleneck, [1, 1, 1, 1, 1], in_channels=6, num_classes=5
    )
    model.eval()
    with torch.no_grad():
        ref_out = model(dict(
            coord=torch.from_numpy(coord),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
        )).numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ptv1_checkpoint

    ours_model = build_model(dict(
        type="PointTransformer-Seg26", in_channels=6, num_classes=5,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.floor(jnp.asarray(coord) / 0.04).astype(jnp.int32)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, report = convert_ptv1_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False
    )
    ours = np.asarray(out.feat[0], np.float32)
    assert ours.shape == ref_out.shape
    # five FPS levels + ten kNN attention layers accumulate fp32 drift in
    # the distance comparisons (the stand-ins compute in fp64); a handful
    # of borderline-neighbor points land ~1e-3 apart
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-3)


def test_ptv1_gradients_match_reference(ref_ptv1):
    """Backward parity through the vector-attention encoder/decoder (FPS,
    kNN grouping, subtraction-attention, IDW interpolation). Tolerances
    match the forward golden's documented FPS/kNN borderline drift."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads

    rng = np.random.default_rng(17)
    n = 4096
    coord = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 6)).astype(np.float32)
    w_out = rng.normal(size=(5,)).astype(np.float32)

    model = ref_ptv1.PointTransformerSeg(
        ref_ptv1.Bottleneck, [1, 1, 1, 1, 1], in_channels=6, num_classes=5
    )
    model.eval()
    out = model(dict(
        coord=torch.from_numpy(coord),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    ))
    (out * torch.from_numpy(w_out)).sum().backward()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in model.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ptv1_checkpoint

    ours_model = build_model(dict(
        type="PointTransformer-Seg26", in_channels=6, num_classes=5,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.floor(jnp.asarray(coord) / 0.04).astype(jnp.int32)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, _ = convert_ptv1_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_ptv1_checkpoint,
        min_checked=40, rtol=2e-2, atol=2e-3, backbone_prefix="",
    )


def test_ptv1_partseg_forward_matches_reference():
    """PartSeg variant (point_transformer_partseg.py:216-374): identical
    trunk plus the dec5 head's shape-category one-hot embedding
    (cls_token -> Linear(L, 1024) -> concat)."""
    from unittest import mock

    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_transformer.point_transformer_partseg"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(29)
    n, n_shape = 4096, 8
    coord = rng.uniform(0, 4, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, 6)).astype(np.float32)

    model = mod.PointTransformerSeg(
        mod.Bottleneck, [1, 1, 1, 1, 1], in_channels=6, num_classes=12,
        num_shape_classes=n_shape,
    )
    model.eval()
    with torch.no_grad(), mock.patch.object(
        torch.Tensor, "cuda", lambda self, *a, **k: self
    ):
        ref_out = model(dict(
            coord=torch.from_numpy(coord),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
            cls_token=torch.tensor([3]),
        )).numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ptv1_checkpoint

    ours_model = build_model(dict(
        type="PointTransformer-PartSeg26", in_channels=6, num_classes=12,
        num_shape_classes=n_shape,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.floor(jnp.asarray(coord) / 0.04).astype(jnp.int32)[None],
        mask=jnp.ones((1, n), bool),
        cls_token=jnp.asarray([3], jnp.int32),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, report = convert_ptv1_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False
    )
    ours = np.asarray(out.feat[0], np.float32)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-3, atol=2e-3)
