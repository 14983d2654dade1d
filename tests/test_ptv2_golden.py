"""Full-model PTv2 (PT-v2m2) forward golden vs the reference torch model
executed through executable pointops/voxel_grid/torch_scatter stand-ins
(tests/ref_exec_stubs.py), weights moved via
utils/ckpt_bridge.convert_ptv2_checkpoint.

Ordering note: the stand-in voxel_grid's cluster-id linearization differs
from torch_geometric's, so pooled ROW orders differ between the two sides —
legitimately, since every downstream op (kNN sets, grouped attention,
segment reductions, map-unpooling) is order-invariant and the decoders map
back to the original point order. The comparison is on final per-point
logits in input order."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402

torch = pytest.importorskip("torch")

MINI = dict(
    in_channels=6,
    num_classes=5,
    patch_embed_depth=1,
    patch_embed_channels=8,
    patch_embed_groups=2,
    patch_embed_neighbours=8,
    enc_depths=(1, 1),
    enc_channels=(16, 16),
    enc_groups=(4, 4),
    enc_neighbours=(8, 8),
    dec_depths=(1, 1),
    dec_channels=(8, 16),
    dec_groups=(2, 4),
    dec_neighbours=(8, 8),
    grid_sizes=(0.12, 0.24),
    pe_multiplier=True,
    pe_bias=True,
    attn_drop_rate=0.0,
    drop_path_rate=0.0,
    unpool_backend="map",
)


@pytest.fixture(scope="module")
def ref_ptv2():
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_transformer_v2.point_transformer_v2m2_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    return mod


def test_ptv2_forward_matches_reference(ref_ptv2):
    rng = np.random.default_rng(17)
    n = 160
    coord = rng.uniform(0, 1.2, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)

    model = ref_ptv2.PointTransformerV2(**MINI)
    model.eval()
    with torch.no_grad():
        ref_out = model(dict(
            coord=torch.from_numpy(coord),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
        ))
        ref_out = (ref_out[1] if isinstance(ref_out, (tuple, list))
                   else ref_out)
        ref_out = ref_out.numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ptv2_checkpoint

    ours_model = build_model(dict(
        type="PT-v2m2", **MINI, stage_capacity=(1.0, 1.0),
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.floor(jnp.asarray(coord) / 0.02).astype(jnp.int32)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, report = convert_ptv2_checkpoint(
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


def test_ptv2_gradients_match_reference(ref_ptv2):
    """Backward-pass parity: d(loss)/d(params) of the mini PTv2 vs torch
    autograd through the pointops/voxel_grid stand-ins — pins the backward
    of grouped vector attention, kNN grouping, grid pooling, and map
    unpooling. Torch grads are mapped through the same bridge as the
    weights (its relayouts are linear and commute with differentiation)."""
    rng = np.random.default_rng(57)
    n = 160
    coord = rng.uniform(0, 1.2, size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, MINI["in_channels"])).astype(np.float32)
    w_out = rng.normal(size=(MINI["num_classes"],)).astype(np.float32)

    model = ref_ptv2.PointTransformerV2(**MINI)
    model.eval()
    out = model(dict(
        coord=torch.from_numpy(coord),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    ))
    out = out[1] if isinstance(out, (tuple, list)) else out
    (out * torch.from_numpy(w_out)).sum().backward()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in model.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ptv2_checkpoint

    ours_model = build_model(dict(
        type="PT-v2m2", **MINI, stage_capacity=(1.0, 1.0),
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.floor(jnp.asarray(coord) / 0.02).astype(jnp.int32)[None],
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, pb, train=False
    )
    params, batch_stats, _ = convert_ptv2_checkpoint(
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
    mapped_grads, _, report = convert_ptv2_checkpoint(
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
        g_ours = flat_ours[key]
        scale = max(np.abs(g_ref).max(), 1e-3)
        np.testing.assert_allclose(
            g_ours / scale, g_ref / scale, rtol=5e-3, atol=5e-4,
            err_msg=f"gradient mismatch at {key}",
        )
        checked += 1
    assert checked > 30
