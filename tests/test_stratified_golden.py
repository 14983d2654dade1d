"""Full-model forward golden: our flax Stratified Transformer (ST-v1m2) vs
the reference's own torch model (stratified_transformer_v1m2_refine.py)
executed on CPU through executable torch_points_kernels / torch_points3d /
pointops2 stand-ins (tests/tp3d_stub.py) — closing VERDICT round-2 item 4.

The kernel-point disposition is shared between both sides (a constant
tensor; torch_points3d's Lloyd-optimized layout is not reproducible without
the library — see tp3d_stub.py docstring). Everything else — ball-query
stem KPConvs, FPS transition downs, fine+stratified window pair sets,
scatter attention with 3-axis quantized RPE tables, kNN max-pool downs,
IDW interpolation ups, classifier — must agree numerically.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402
from tests.tp3d_stub import install_tp3d_stubs  # noqa: E402

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

CFG = dict(
    in_channels=6,
    num_classes=5,
    channels=(16, 32, 32),
    num_heads=(2, 2),
    depths=(1, 2),
    window_size=(0.4, 0.8),
    quant_size=(0.02, 0.04),
    mlp_expend_ratio=2.0,
    down_ratio=0.25,
    down_num_sample=8,
    kp_ball_radius=0.3,
    kp_max_neighbor=16,
    drop_path_rate=0.0,
)


def test_stratified_forward_matches_reference():
    install_executable_stubs()
    install_tp3d_stubs()
    mod = load_reference_package(
        "pointcept.models.stratified_transformer.stratified_transformer_v1m2_refine"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(41)
    n = 96
    coord = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, CFG["in_channels"])).astype(np.float32)

    ref = mod.StratifiedTransformer(
        **CFG, kp_grid_size=0.2, kp_sigma=1.0, stem=True,
    )
    ref.eval()
    with torch.no_grad():
        # the inert timm trunc_normal_ leaves the RPE tables at zero; give
        # them real values so the bias terms discriminate
        g = torch.Generator().manual_seed(5)
        for name, p in ref.named_parameters():
            if "relative_pos" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)

    from unittest import mock

    with torch.no_grad(), mock.patch.object(
        torch.Tensor, "cuda", lambda self, *a, **k: self
    ):
        ref_out = ref(
            dict(
                feat=torch.from_numpy(feat),
                coord=torch.from_numpy(coord),
                offset=torch.tensor([n]),
            )
        ).numpy()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_stratified_checkpoint

    ours_model = build_model(dict(
        type="ST-v1m2", **CFG, kp_sigma_radius=0.2, stem=True,
        fine_capacity=96, coarse_capacity=32,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None], feat=jnp.asarray(feat)[None],
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        pb, train=False,
    )
    params, batch_stats, report = convert_stratified_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )
    unused = [k for k in report["unused_torch_keys"]
              if "num_batches_tracked" not in k and "K_points" not in k]
    assert unused == [], unused
    out = ours_model.apply(
        {"params": params, "batch_stats": batch_stats}, pb, train=False,
    )
    ours_out = np.asarray(out.feat[0], np.float32)
    assert ours_out.shape == ref_out.shape
    # FPS in fp32 vs fp64 can flip distant-tie picks; everything downstream
    # is fp32 — match the PTv1 golden's tolerance
    np.testing.assert_allclose(ours_out, ref_out, rtol=2e-3, atol=2e-3)


def test_stratified_gradients_match_reference():
    """Backward parity through KPConv stem, window pair-set attention with
    quantized RPE tables, FPS/kNN downs and IDW ups."""
    from tests.test_spvcnn_golden import _compare_bridge_mapped_grads

    install_executable_stubs()
    install_tp3d_stubs()
    mod = load_reference_package(
        "pointcept.models.stratified_transformer.stratified_transformer_v1m2_refine"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(43)
    n = 96
    coord = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    feat = rng.normal(size=(n, CFG["in_channels"])).astype(np.float32)
    w_out = rng.normal(size=(CFG["num_classes"],)).astype(np.float32)

    ref = mod.StratifiedTransformer(
        **CFG, kp_grid_size=0.2, kp_sigma=1.0, stem=True,
    )
    ref.eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(6)
        for name, p in ref.named_parameters():
            if "relative_pos" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)

    from unittest import mock

    # the reference Block.forward uses `feats += ...` (l.284), which bumps
    # the version of LayerNorm's saved input and breaks torch autograd on
    # CPU; swap in the out-of-place equivalent (same values) for backward
    def _block_fwd(self, feats, coords, index_0, index_1, index_0_offsets,
                   n_max):
        short_cut = feats
        feats = self.norm1(feats)
        feats = self.attn(feats, coords, index_0, index_1, index_0_offsets,
                          n_max)
        feats = short_cut + self.drop_path(feats)
        return feats + self.drop_path(self.mlp(self.norm2(feats)))

    with mock.patch.object(
        torch.Tensor, "cuda", lambda self, *a, **k: self
    ), mock.patch.object(mod.Block, "forward", _block_fwd):
        out = ref(
            dict(
                feat=torch.from_numpy(feat),
                coord=torch.from_numpy(coord),
                offset=torch.tensor([n]),
            )
        )
    (out * torch.from_numpy(w_out)).sum().backward()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    grads_t = {k: p.grad.detach().numpy()
               for k, p in ref.named_parameters() if p.grad is not None}

    from scenesplat_tpu.models import PointBatch, build_model
    from scenesplat_tpu.utils.ckpt_bridge import convert_stratified_checkpoint

    ours_model = build_model(dict(
        type="ST-v1m2", **CFG, kp_sigma_radius=0.2, stem=True,
        fine_capacity=96, coarse_capacity=32,
    ))
    pb = PointBatch(
        coord=jnp.asarray(coord)[None], feat=jnp.asarray(feat)[None],
        grid_coord=jnp.zeros((1, n, 3), jnp.int32),
        mask=jnp.ones((1, n), bool),
    )
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        pb, train=False,
    )
    params, batch_stats, _ = convert_stratified_checkpoint(
        state, variables["params"], variables.get("batch_stats", {}),
        backbone_prefix="",
    )

    def loss_fn(p):
        out = ours_model.apply(
            {"params": p, "batch_stats": batch_stats}, pb, train=False,
        )
        return (out.feat[0] * jnp.asarray(w_out)).sum()

    ours_grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    _compare_bridge_mapped_grads(
        ours_grads, grads_t, params, convert_stratified_checkpoint,
        min_checked=30, rtol=2e-2, atol=2e-3, backbone_prefix="",
    )
