"""DINOHead golden: our SSL projection head (MLP + eps=1e-4 L2 normalize,
remove_last_layer variant) vs the reference simdinov2.DINOHead on mapped
weights."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from tests.conftest import load_reference_package  # noqa: E402
from tests.ref_exec_stubs import install_executable_stubs  # noqa: E402

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("nlayers", [2, 3])
def test_dino_head_matches_reference(nlayers):
    install_executable_stubs()
    mod = load_reference_package("pointcept.models.simdinov2")
    if mod is None:
        pytest.skip("reference repo unavailable")
    rng = np.random.default_rng(73)
    in_dim, hidden, bottleneck = 24, 32, 16
    x = rng.normal(size=(50, in_dim)).astype(np.float32)

    head = mod.DINOHead(
        in_dim, out_dim=8, nlayers=nlayers, hidden_dim=hidden,
        bottleneck_dim=bottleneck, remove_last_layer=True, normalize=True,
    )
    head.eval()
    with torch.no_grad():
        ref = head(torch.from_numpy(x)).numpy()
    state = {k: v.detach().numpy() for k, v in head.state_dict().items()}

    from scenesplat_tpu.models.ssl import DINOHead

    ours = DINOHead(out_dim=8, hidden_dim=hidden, bottleneck_dim=bottleneck,
                    nlayers=nlayers)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.array, variables["params"])
    # reference Sequential: Linear, GELU repeated, final Linear at
    # mlp.{2*(j-1)} -> our fc{j}
    for j in range(1, nlayers + 1):
        t = f"mlp.{2 * (j - 1)}"
        params[f"fc{j}"]["kernel"] = state[f"{t}.weight"].T
        params[f"fc{j}"]["bias"] = state[f"{t}.bias"]
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
