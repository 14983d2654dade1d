"""Full-model PPT-v1m1 forward golden vs the reference language-guided
PointPromptTraining over a SpUNet-v1m3 PDNorm backbone, through executable
spconv stand-ins and a deterministic fake `clip` module (the reference
encodes class names with CLIP at init; the fake returns fixed embeddings
that our side loads from the same npy). Verifies the whole chain: context
embedding -> PDNorm-conditioned backbone -> proj head -> cosine sim vs the
condition's LOCAL class slice * exp(logit_scale)."""

import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.test_full_model_golden import _make_scene  # noqa: E402

torch = pytest.importorskip("torch")

CONDITIONS = ("CondA", "CondB")
CLASSES = ("wall", "floor", "chair", "table", "sofa", "lamp")
VALID = ((0, 1, 2, 5), (1, 3, 4))
TEXT_C = 32


def _install_fake_clip(emb):
    clip = types.ModuleType("clip")

    class _Model:
        text_projection = torch.zeros(8, TEXT_C)
        logit_scale = torch.nn.Parameter(
            torch.tensor(float(np.log(1 / 0.07))))

        def requires_grad_(self, flag):
            return self

        def encode_text(self, tokens):
            return torch.from_numpy(emb.copy())

    clip.load = lambda *a, **k: (_Model(), None)
    clip.tokenize = lambda prompts: torch.zeros(len(prompts), 4)
    sys.modules["clip"] = clip


@pytest.mark.parametrize("cond_idx", [0, 1])
def test_ppt_forward_matches_reference(cond_idx, tmp_path):
    install_executable_stubs()
    rng = np.random.default_rng(53)
    emb = rng.normal(size=(len(CLASSES), TEXT_C)).astype(np.float32)
    _install_fake_clip(emb)
    mod = load_reference_package(
        "pointcept.models.point_prompt_training."
        "point_prompt_training_v1m1_language_guided"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")

    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    backbone = dict(
        type="SpUNet-v1m3", in_channels=4, num_classes=0, base_channels=8,
        channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
        conditions=CONDITIONS,
    )
    ref_backbone = dict(backbone, zero_init=False, norm_affine=False)
    class _AD(dict):  # the reference reads backbone.type attribute-style
        __getattr__ = dict.__getitem__

    model = mod.PointPromptTraining(
        backbone=_AD(ref_backbone),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        backbone_out_channels=8, context_channels=256,
        conditions=CONDITIONS, class_name=CLASSES, valid_index=VALID,
    )
    model.eval()
    with torch.no_grad():
        out = model(dict(
            coord=torch.from_numpy(coord * 0.02),
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
            condition=[CONDITIONS[cond_idx]],
        ))
        ref_logits = out["seg_logits"].numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # our side loads the same embeddings from disk (normalized like CLIP's)
    emb_n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    np.save(tmp_path / "cls_emb.npy", emb_n)

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ppt_checkpoint

    ours_model = build_model(dict(
        type="PPT-v1m1",
        backbone=dict(backbone, stage_capacity=(0.5, 0.25),
                      pd_adaptive=True),
        backbone_out_channels=8, context_channels=256,
        conditions=CONDITIONS, class_name=CLASSES, valid_index=VALID,
        class_embedding_path=str(tmp_path / "cls_emb.npy"),
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord * 0.02)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    cidx = jnp.asarray(cond_idx, jnp.int32)
    variables = ours_model.init(jax.random.PRNGKey(0), pb, cidx)
    params, batch_stats, report = convert_ppt_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        num_conditions=len(CONDITIONS),
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats,
         "constants": variables["constants"]}, pb, cidx, train=False,
    )
    k = len(VALID[cond_idx])
    ours = np.asarray(out.feat[0, :, :k], np.float32)
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-4, atol=2e-4)
    # the padded tail slots are -inf-masked
    assert (np.asarray(out.feat[0, :, k:]) < -1e8).all()


def test_ppt_gradients_match_reference(tmp_path):
    """Backward parity through the full PPT-v1m1 chain: context embedding,
    PDNorm backbone, proj head, cosine-sim logits * exp(logit_scale)."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads

    cond_idx = 0
    install_executable_stubs()
    rng = np.random.default_rng(61)
    emb = rng.normal(size=(len(CLASSES), TEXT_C)).astype(np.float32)
    _install_fake_clip(emb)
    mod = load_reference_package(
        "pointcept.models.point_prompt_training."
        "point_prompt_training_v1m1_language_guided"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")

    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    backbone = dict(
        type="SpUNet-v1m3", in_channels=4, num_classes=0, base_channels=8,
        channels=(8, 16, 16, 8), layers=(1, 1, 1, 1),
        conditions=CONDITIONS,
    )

    class _AD(dict):
        __getattr__ = dict.__getitem__

    model = mod.PointPromptTraining(
        backbone=_AD(dict(backbone, zero_init=False, norm_affine=False)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        backbone_out_channels=8, context_channels=256,
        conditions=CONDITIONS, class_name=CLASSES, valid_index=VALID,
    )
    model.eval()
    k = len(VALID[cond_idx])
    w_out = rng.normal(size=(k,)).astype(np.float32)
    out = model(dict(
        coord=torch.from_numpy(coord * 0.02),
        grid_coord=torch.from_numpy(grid).int(),
        feat=torch.from_numpy(feat),
        offset=torch.tensor([n]),
        condition=[CONDITIONS[cond_idx]],
    ))
    (out["seg_logits"] * torch.from_numpy(w_out)).sum().backward()
    state = {k2: v.detach().numpy() for k2, v in model.state_dict().items()}
    grads_t = {k2: p.grad.detach().numpy()
               for k2, p in model.named_parameters() if p.grad is not None}
    emb_n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    np.save(tmp_path / "cls_emb.npy", emb_n)

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ppt_checkpoint

    ours_model = build_model(dict(
        type="PPT-v1m1",
        backbone=dict(backbone, stage_capacity=(0.5, 0.25),
                      pd_adaptive=True),
        backbone_out_channels=8, context_channels=256,
        conditions=CONDITIONS, class_name=CLASSES, valid_index=VALID,
        class_embedding_path=str(tmp_path / "cls_emb.npy"),
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord * 0.02)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    cidx = jnp.asarray(cond_idx, jnp.int32)
    variables = ours_model.init(jax.random.PRNGKey(0), pb, cidx)
    params, batch_stats, _ = convert_ppt_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        num_conditions=len(CONDITIONS),
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats,
             "constants": variables["constants"]}, pb, cidx, train=False,
        )
        return (out.feat[0, :, :k] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_ppt_checkpoint,
        min_checked=20, num_conditions=len(CONDITIONS),
    )


@pytest.mark.parametrize("cond_idx", [0, 1])
def test_ppt_v1m2_forward_matches_reference(cond_idx):
    """Decoupled-head variant: per-condition Linear heads (reference v1m2);
    ours pad to max(num_classes) with a masked tail."""
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.point_prompt_training."
        "point_prompt_training_v1m2_decoupled"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(59)
    coord, grid, _ = _make_scene(rng, n_parents=64, levels=2)
    n = len(grid)
    feat = rng.normal(size=(n, 4)).astype(np.float32)
    num_classes = (6, 4)
    backbone = dict(
        type="SpUNet-v1m3", in_channels=4, num_classes=0, base_channels=8,
        channels=(8, 16, 16, 8), layers=(1, 1, 1, 1), conditions=CONDITIONS,
    )

    class _AD(dict):
        __getattr__ = dict.__getitem__

    model = mod.PointPromptTraining(
        backbone=_AD(dict(backbone, zero_init=False, norm_affine=False)),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
        backbone_out_channels=8, context_channels=256,
        conditions=CONDITIONS, num_classes=num_classes,
    )
    model.eval()
    with torch.no_grad():
        out = model(dict(
            coord=torch.from_numpy(coord * 0.02),
            grid_coord=torch.from_numpy(grid).int(),
            feat=torch.from_numpy(feat),
            offset=torch.tensor([n]),
            condition=[CONDITIONS[cond_idx]],
        ))
        ref_logits = out["seg_logits"].numpy()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_ppt_v1m2_checkpoint

    ours_model = build_model(dict(
        type="PPT-v1m2",
        backbone=dict(backbone, stage_capacity=(0.5, 0.25),
                      pd_adaptive=True),
        backbone_out_channels=8, context_channels=256,
        conditions=CONDITIONS, num_classes=num_classes,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord * 0.02)[None],
        feat=jnp.asarray(feat)[None],
        grid_coord=jnp.asarray(grid)[None],
        mask=jnp.ones((1, n), bool),
    )
    cidx = jnp.asarray(cond_idx, jnp.int32)
    variables = ours_model.init(jax.random.PRNGKey(0), pb, cidx)
    params, batch_stats, report = convert_ppt_v1m2_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        num_conditions=len(CONDITIONS),
    )
    assert report["unused_torch_keys"] == [], report["unused_torch_keys"]
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, cidx, train=False,
    )
    k = num_classes[cond_idx]
    ours = np.asarray(out.feat[0, :, :k], np.float32)
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-4, atol=2e-4)
