"""Full-model forward golden: our flax OctFormer (OctFormer-v1m1) vs the
reference's own torch model (octformer_v1m1_base.py:507-630) executed on CPU
through executable ocnn/dwconv stand-ins (tests/ocnn_stub.py) — closing the
last un-goldened backbone family (VERDICT round-2 item 4).

The octree build (leaf quantization + duplicate averaging), shuffled-key
window partition (+dilation), RPE, depthwise-conv CPE, k2s2 stem/stage
downsamples, FPN nearest upsampling, k3s2 head-up deconvs, and final
nearest interpolation back to points must all agree numerically. The
stride-2 k3 deconv tap anchoring is the documented spec both sides
implement (ocnn_stub.py docstring; same caveat class as spconv KRSC).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ocnn_stub import install_ocnn_stubs  # noqa: E402

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

CFG = dict(
    in_channels=5,
    num_classes=4,
    fpn_channels=16,
    channels=(8, 16, 16),
    num_blocks=(2, 1, 1),
    num_heads=(2, 2, 2),
    patch_size=4,
    dilation=2,
    stem_down=2,
    head_up=2,
    drop_path=0.0,
    octree_scale_factor=2.56,
    octree_depth=6,
    octree_full_depth=2,
)


def _run_reference(coord, normal, feat, train=False):
    install_ocnn_stubs()
    mod = load_reference_package(
        "pointcept.models.octformer.octformer_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    torch.manual_seed(3)
    ref = mod.OctFormer(**CFG)
    ref.train(train)
    n = len(coord)
    data = dict(
        coord=torch.from_numpy(coord),
        normal=torch.from_numpy(normal),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    )
    # snapshot BEFORE the forward: a train-mode forward updates torch's
    # running stats in place, and the bridge must see the pre-step state
    state = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    with torch.no_grad():
        ref_out = ref(data).numpy()
    return ref, ref_out, state


def _build_ours(state, n):
    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_octformer_checkpoint

    model = build_model(dict(
        type="OctFormer-v1m1", **CFG,
        quantization="ocnn",
        serialization_depth=12,
        stage_capacity=(1.0,) * (CFG["stem_down"] + len(CFG["channels"]) - 1),
    ))
    pb_shape = PointBatch(
        coord=jnp.zeros((1, n, 3), jnp.float32),
        feat=jnp.zeros((1, n, CFG["in_channels"]), jnp.float32),
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pb_shape, train=False,
    )
    params, batch_stats, report = convert_octformer_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )
    unused = [k for k in report["unused_torch_keys"]
              if "num_batches_tracked" not in k]
    assert unused == [], unused
    return model, params, batch_stats


def test_octformer_forward_matches_reference():
    rng = np.random.default_rng(17)
    n = 200
    coord = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, CFG["in_channels"])).astype(np.float32)

    _, ref_out, state = _run_reference(coord, normal, feat)
    model, params, batch_stats = _build_ours(state, n)

    from scenesplat_tpu.models import PointBatch

    pb = PointBatch(
        coord=jnp.asarray(coord)[None], feat=jnp.asarray(feat)[None],
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False,
    )
    ours_out = np.asarray(out.feat[0], np.float32)
    assert ours_out.shape == ref_out.shape
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-4, atol=1e-4)


def test_octformer_train_mode_batchnorm_matches_reference():
    """Train-mode forward (drop rates are all 0 -> deterministic): batch-stat
    normalization and the post-step running stats must match torch, pinning
    the per-site BN momentum split (ocnn modules 0.01 vs raw torch 0.1)."""
    rng = np.random.default_rng(23)
    n = 160
    # spread wide enough that every level keeps >1 octant (torch train-mode
    # BN rejects single-sample batches)
    coord = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, CFG["in_channels"])).astype(np.float32)

    ref, ref_out, state = _run_reference(coord, normal, feat, train=True)
    ref_stats = {k: v.detach().numpy().copy()
                 for k, v in ref.state_dict().items()
                 if "running_" in k}
    model, params, batch_stats = _build_ours(state, n)

    from scenesplat_tpu.models import PointBatch
    from scenesplat_tpu.utils.ckpt_bridge import convert_octformer_checkpoint

    pb = PointBatch(
        coord=jnp.asarray(coord)[None], feat=jnp.asarray(feat)[None],
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out.feat[0], np.float32), ref_out, rtol=1e-4, atol=1e-4
    )
    # reuse the bridge's name mapping to compare updated running stats: brige
    # the REFERENCE's post-step stats and check they equal ours
    _, want_stats, _ = convert_octformer_checkpoint(
        ref_stats, params, mutated["batch_stats"], backbone_prefix="",
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        mutated["batch_stats"], want_stats,
    )


def test_octformer_gradients_match_reference():
    """Backward-pass parity: d(loss)/d(params) of the mini OctFormer vs
    torch autograd through the ocnn stand-ins — pins the backward of the
    window attention, dw-conv CPE, k2s2 downsamples, FPN unpooling, and the
    corner-anchored k3s2 deconv. Torch grads are mapped through the same
    bridge as the weights (its relayouts are linear and commute with
    differentiation)."""
    rng = np.random.default_rng(41)
    n = 200
    coord = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, CFG["in_channels"])).astype(np.float32)
    w_out = rng.normal(size=(CFG["num_classes"],)).astype(np.float32)

    install_ocnn_stubs()
    mod = load_reference_package(
        "pointcept.models.octformer.octformer_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    torch.manual_seed(3)
    ref = mod.OctFormer(**CFG)
    ref.eval()
    state = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    out = ref(dict(
        coord=torch.from_numpy(coord),
        normal=torch.from_numpy(normal),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
    ))
    (out * torch.from_numpy(w_out)).sum().backward()
    grads_t = {k: p.grad.detach().numpy()
               for k, p in ref.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch
    from scenesplat_tpu.utils.ckpt_bridge import convert_octformer_checkpoint

    model, params, batch_stats = _build_ours(state, n)
    pb = PointBatch(
        coord=jnp.asarray(coord)[None], feat=jnp.asarray(feat)[None],
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(jax.tree_util.tree_map(jnp.asarray, params))
    zero_template = jax.tree_util.tree_map(np.zeros_like, params)
    mapped_grads, _, report = convert_octformer_checkpoint(
        grads_t, zero_template, {}, backbone_prefix="",
    )
    assert report["filled_leaves"] > 40
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
    assert checked > 40
