"""End-to-end MSC (MaskedSceneContrast) wrapper goldens vs the reference
torch models — v1m1 (masked_scene_contrast_v1m1_base.py:205-310) and the
v1m2 CSC-partitioned variant (masked_scene_contrast_v1m2_csc.py:202-384) —
with the SpUNet-v1m1 backbone run through executable spconv stand-ins.

The wrapper's two stochastic stages — cross-mask patch tagging (torch
randperm, l.111-128) and contrastive-pair selection (randint/randperm,
l.163-171) — are injected identically into both sides (numpy-generated;
the reference via method monkeypatch, ours via the model's replay batch
keys). Everything downstream runs live on both sides: mask-token feature
mixing, TWO backbone passes, matched-pair InfoNCE (v1m2: per-scene,
per-spatial-partition with the always-present close-pair partition), the
color L2 head on masked points, and the normal dot-product head."""

from unittest import mock

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

BACKBONE = dict(
    in_channels=4,
    num_classes=0,
    base_channels=8,
    channels=(8, 16, 16, 8),
    layers=(1, 1, 1, 1),
)
CSC = dict(partitions=4, r1=0.125, r2=0.6)


def _unique_grid(rng, n, extent=24):
    seen = set()
    while len(seen) < n:
        seen.add(tuple(rng.integers(0, extent, 3).tolist()))
    g = np.array(sorted(seen), np.int32)
    return g[rng.permutation(n)]


def _run_pair(variant, grads=False):
    install_executable_stubs()
    if variant == "MSC-v1m1":
        mod = load_reference_package(
            "pointcept.models.masked_scene_contrast."
            "masked_scene_contrast_v1m1_base"
        )
        ref_cls_name, extra = "MaskedSceneContrast", {}
    else:
        mod = load_reference_package(
            "pointcept.models.masked_scene_contrast."
            "masked_scene_contrast_v1m2_csc"
        )
        ref_cls_name, extra = "MaskedSceneContrast", dict(CSC)
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(91)
    n, p, cin = 150, 32, BACKBONE["in_channels"]

    views = {}
    for v in ("view1", "view2"):
        grid = _unique_grid(rng, n)
        coord = grid.astype(np.float32) * 0.05
        views[v] = dict(
            grid_coord=grid,
            coord=coord,
            origin_coord=coord + rng.normal(0, 0.01, coord.shape).astype(
                np.float32),
            feat=rng.normal(size=(n, cin)).astype(np.float32),
            color=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
            normal=rng.normal(size=(n, 3)).astype(np.float32),
        )
    pm1 = rng.random(n) < 0.4
    pm2 = rng.random(n) < 0.4
    i1 = rng.choice(n, size=p, replace=False).astype(np.int64)
    i2 = rng.integers(0, n, size=p).astype(np.int64)

    torch.manual_seed(8)
    ref = getattr(mod, ref_cls_name)(
        backbone=dict(type="SpUNet-v1m1", **BACKBONE),
        backbone_in_channels=cin, backbone_out_channels=BACKBONE["channels"][-1],
        nce_t=0.4, contrast_weight=1.0, reconstruct_weight=1.0,
        reconstruct_color=True, reconstruct_normal=True, **extra,
    )
    # the inert timm trunc_normal_ leaves mask_token at zero; randomize so
    # the masked-feature mixing actually discriminates
    with torch.no_grad():
        ref.mask_token.copy_(torch.randn(ref.mask_token.shape) * 0.2)
    ref.eval()
    state = {k: t.detach().numpy().copy() for k, t in ref.state_dict().items()}

    # inject the stochastic stages
    ref.generate_cross_masks = lambda *a, **k: (
        torch.from_numpy(pm1), torch.from_numpy(pm2))
    ref.match_contrastive_pair = lambda *a, **k: torch.from_numpy(
        np.stack([i1, i2], axis=1))

    data = {}
    for v in ("view1", "view2"):
        data[f"{v}_origin_coord"] = torch.from_numpy(views[v]["origin_coord"])
        data[f"{v}_coord"] = torch.from_numpy(views[v]["coord"])
        data[f"{v}_grid_coord"] = torch.from_numpy(views[v]["grid_coord"]).int()
        data[f"{v}_feat"] = torch.from_numpy(views[v]["feat"])
        data[f"{v}_color"] = torch.from_numpy(views[v]["color"])
        data[f"{v}_normal"] = torch.from_numpy(views[v]["normal"])
        data[f"{v}_offset"] = torch.tensor([n])
    grads_t = None
    with mock.patch.object(
        torch.Tensor, "cuda", lambda self, *a, **k: self
    ):
        if grads:
            ref_raw = ref(data)
            ref_raw["loss"].backward()
            grads_t = {k: q.grad.detach().numpy()
                       for k, q in ref.named_parameters()
                       if q.grad is not None}
            ref_out = {k: float(t.detach()) for k, t in ref_raw.items()}
        else:
            with torch.no_grad():
                ref_out = {k: float(t) for k, t in ref(data).items()}

    from scenesplat_tpu.models import build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_msc_checkpoint

    ours_model = build_model(dict(
        type=variant,
        backbone=dict(type="SpUNet-v1m1", **BACKBONE,
                      stage_capacity=(1.0, 1.0)),
        backbone_in_channels=cin,
        backbone_out_channels=BACKBONE["channels"][-1],
        nce_t=0.4, **extra,
    ))
    batch = {}
    for v in ("view1", "view2"):
        for key in ("origin_coord", "coord", "feat", "color", "normal"):
            batch[f"{v}_{key}"] = jnp.asarray(views[v][key])[None]
        batch[f"{v}_grid_coord"] = jnp.asarray(views[v]["grid_coord"])[None]
        batch[f"{v}_mask"] = jnp.ones((1, n), bool)
    batch["view1_point_mask"] = jnp.asarray(pm1)[None]
    batch["view2_point_mask"] = jnp.asarray(pm2)[None]
    batch["match_scene"] = jnp.zeros(p, jnp.int32)
    batch["match_i1"] = jnp.asarray(i1.astype(np.int32))
    batch["match_i2"] = jnp.asarray(i2.astype(np.int32))
    batch["match_valid"] = jnp.ones(p, bool)

    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    params, batch_stats, report = convert_msc_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
    )
    unused = [k for k in report["unused_torch_keys"]
              if "num_batches_tracked" not in k]
    assert unused == [], unused
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, train=False,
        rngs={"shuffle": jax.random.PRNGKey(2)},
    )
    if not grads:
        return out, ref_out

    def loss_fn(p):
        res = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, batch, train=False,
            rngs={"shuffle": jax.random.PRNGKey(2)},
        )
        return res["loss"]

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    return out, ref_out, ours_grads, grads_t, params


@pytest.mark.parametrize("variant", ["MSC-v1m1", "MSC-v1m2"])
def test_msc_e2e_matches_reference(variant):
    out, ref_out = _run_pair(variant)
    for key in ("nce_loss", "pos_sim", "neg_sim", "color_loss",
                "normal_loss", "loss"):
        np.testing.assert_allclose(
            float(out[key]), ref_out[key], rtol=1e-4, atol=1e-4,
            err_msg=key,
        )


@pytest.mark.parametrize("variant", ["MSC-v1m1", "MSC-v1m2"])
def test_msc_e2e_gradients_match_reference(variant):
    """Backward parity of the composed SSL step: mask-token mixing, two
    backbone passes, InfoNCE (v1m2: per-partition CSC), color/normal heads."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads
    from scenesplat_tpu.utils.ckpt_bridge import convert_msc_checkpoint

    out, ref_out, ours_grads, grads_t, params = _run_pair(variant, grads=True)
    np.testing.assert_allclose(
        float(out["loss"]), ref_out["loss"], rtol=1e-4, atol=1e-4)
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_msc_checkpoint,
        min_checked=25,
    )
