"""MSC contrastive-loss golden: compute_contrastive_loss (matched-pair
InfoNCE + pos/neg similarity monitors) vs the reference MaskedSceneContrast
method on identical features and matches (masked-pair padding covered).
The full MSC forward is NOT goldenable — its view masks come from torch's
global RNG — but the loss math is deterministic given the matches."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("n_pad", [0, 7])
def test_msc_contrastive_loss_matches_reference(n_pad):
    install_executable_stubs()
    mod = load_reference_package(
        "pointcept.models.masked_scene_contrast."
        "masked_scene_contrast_v1m1_base"
    )
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(67)
    n, c, p = 120, 16, 48
    f1 = rng.normal(size=(n, c)).astype(np.float32)
    f2 = rng.normal(size=(n, c)).astype(np.float32)
    i1 = rng.choice(n, size=p, replace=False).astype(np.int32)
    i2 = rng.choice(n, size=p, replace=False).astype(np.int32)

    ref_model = mod.MaskedSceneContrast(
        backbone=dict(type="SpUNet-v1m1", in_channels=4, num_classes=0,
                      base_channels=8, channels=(8, 16, 16, 8),
                      layers=(1, 1, 1, 1)),
        backbone_in_channels=4, backbone_out_channels=8, nce_t=0.4,
        reconstruct_color=False, reconstruct_normal=False,
    )
    with torch.no_grad():
        loss, pos, neg = ref_model.compute_contrastive_loss(
            torch.from_numpy(f1), torch.tensor([n]),
            torch.from_numpy(f2), torch.tensor([n]),
            torch.from_numpy(np.stack([i1, i2], 1).astype(np.int64)),
        )

    from types import SimpleNamespace

    from scenesplat_tpu.models.msc import MaskedSceneContrast

    # the method reads only self.nce_t — call it unbound on a namespace
    # (no flax variables involved)
    self_ns = SimpleNamespace(nce_t=0.4)
    # padded-pair layout: valid pairs first, n_pad masked tail slots
    pp = p + n_pad
    i1p = np.concatenate([i1, np.zeros(n_pad, np.int32)])
    i2p = np.concatenate([i2, np.zeros(n_pad, np.int32)])
    valid = np.arange(pp) < p
    nce, pos_o, neg_o = MaskedSceneContrast.compute_contrastive_loss(
        self_ns,
        jnp.asarray(f1)[None], jnp.asarray(f2)[None],
        jnp.zeros(pp, jnp.int32), jnp.asarray(i1p), jnp.asarray(i2p),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(float(nce), float(loss), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(pos_o), float(pos), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(neg_o), float(neg), rtol=1e-5, atol=1e-5)
