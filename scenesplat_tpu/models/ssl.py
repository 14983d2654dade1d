"""SimDINO-style self-supervised pretraining components.

TPU re-design of the reference SSL stack (pointcept/models/simdinov2.py:79-557
and pointcept/models/losses/{sim_dino_clstoken_loss,sim_ibot_patch_loss}.py):

  - ``DINOHead``: 3-layer MLP -> L2-normalized embedding (both reference
    instantiations use remove_last_layer=True, so the weight-norm last layer
    is omitted by construction; reference simdinov2.py:23-76).
  - ``mcr_loss``: SimDINO coding-rate expansion + cosine compression over the
    pooled crop embeddings (reference sim_dino_clstoken_loss.py:91-170); the
    covariance is computed over the pjit-global batch, so the reference's
    explicit ``dist.nn.all_reduce`` falls out of SPMD semantics.
  - ``cosine_patch_loss``: masked iBOT-style cosine loss on decoder features
    (reference sim_ibot_patch_loss.py:127-165).
  - ``generate_token_masks``: fixed-shape Bernoulli / voxel-patch mask
    generator (reference simdinov2.py:209-302). Patch mode groups points by
    ``floor(coord / mask_grid_size)`` — the reference passes grid_coord where
    metric coords were evidently intended (making every voxel its own patch);
    this implementation uses metric coords as the comment "0.2 / 0.1 for
    indoor scene" implies.
  - ``SimDINOSSL``: student backbone + shared projection heads; the teacher
    is an EMA copy of the *backbone parameters only* held in the train state
    and passed in explicitly (reference simdinov2.py:191-206).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from scenesplat_tpu.ops.segops import masked_mean_pool
from .builder import MODELS, build_model
from .structure import PointBatch


def _l2n(x, eps=1e-4):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps))


class DINOHead(nn.Module):
    out_dim: int = 256
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.truncated_normal(0.02)
        x = nn.Dense(self.hidden_dim, kernel_init=init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        for i in range(self.nlayers - 2):
            x = nn.Dense(
                self.hidden_dim, kernel_init=init, dtype=self.dtype, name=f"fc{i + 2}"
            )(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(
            self.bottleneck_dim, kernel_init=init, dtype=self.dtype,
            name=f"fc{self.nlayers}",
        )(x)
        return _l2n(x)


def half_logdet(x):
    chol = jnp.linalg.cholesky(x)
    return jnp.sum(jnp.log(jnp.maximum(jnp.diagonal(chol), 1e-12)))


def mcr_loss(
    student_feats: Sequence[jnp.ndarray],
    teacher_feats: Sequence[jnp.ndarray],
    eps: float = 0.05,
    coeff: float = 0.1,
    expa_type: int = 1,
    no_diag: bool = True,
):
    """student_feats: ncrops x [M, D] (L2-normalized); teacher: 2 x [M, D]."""
    s = jnp.stack(student_feats).astype(jnp.float32)  # [S, M, D]
    t = jax.lax.stop_gradient(jnp.stack(teacher_feats).astype(jnp.float32))  # [T, M, D]
    n_s, n_t = s.shape[0], t.shape[0]

    sim = jnp.einsum("tmd,smd->ts", t, s) / s.shape[1]
    if no_diag:
        eye = jnp.eye(n_t, n_s, dtype=bool)
        sim = jnp.where(eye, 0.0, sim)
    n_terms = n_t * n_s - min(n_t, n_s)
    comp_loss = sim.sum() / n_terms

    expa_feat = (s[:n_t] + t) / 2 if expa_type == 1 else s[:n_t]
    m, p = expa_feat.shape[1], expa_feat.shape[2]
    cov = jnp.einsum("nbc,nbd->ncd", expa_feat, expa_feat)
    scalar = p / (m * eps)
    eye = jnp.eye(p)
    expa = sum(half_logdet(eye + scalar * cov[i]) for i in range(n_t)) / n_t
    expa = expa * (p + m) / (p * m)

    loss = -coeff * comp_loss - expa
    return loss, {
        "mcr_comp_loss": comp_loss,
        "mcr_expa_loss": expa,
    }


def cosine_patch_loss(
    student_tokens: jnp.ndarray,
    teacher_tokens: jnp.ndarray,
    weights: jnp.ndarray,
    view_nums: int = 1,
):
    """[M, D] head outputs (L2-normalized); weights zero for unmasked slots."""
    cos = (
        jax.lax.stop_gradient(teacher_tokens.astype(jnp.float32))
        * student_tokens.astype(jnp.float32)
    ).sum(-1)
    return -(cos * weights).sum() / view_nums


def generate_token_masks(
    rng: jax.Array,
    coord: jnp.ndarray,
    mask: jnp.ndarray,
    mask_type: str = "patch",
    mask_grid_size: float = 0.2,
    mask_ratio_min_max: Tuple[float, float] = (0.1, 0.5),
    mask_sample_probability: float = 0.5,
):
    """Per-point token masks + weights, fixed shapes.

    Returns (token_mask [B, N] bool, weight [B, N] f32). A subset of samples
    (prob ``mask_sample_probability``) is masked; masked samples hide a
    U(min,max) fraction of points ('splats') or of ``mask_grid_size`` voxel
    patches ('patch'); per-point weight is 1/num_masked_units.
    """
    b, n = mask.shape
    k_sample, k_rate, k_unit = jax.random.split(rng, 3)
    sample_on = jax.random.bernoulli(k_sample, mask_sample_probability, (b, 1))
    rate = jax.random.uniform(
        k_rate, (b, 1), minval=mask_ratio_min_max[0], maxval=mask_ratio_min_max[1]
    )

    if mask_type == "splats":
        u = jax.random.uniform(k_unit, (b, n))
        token_mask = (u < rate) & mask & sample_on
        n_masked = jnp.maximum(token_mask.sum(-1, keepdims=True), 1)
        weight = token_mask / n_masked
        return token_mask, weight.astype(jnp.float32)

    assert mask_type == "patch"
    # patch id by voxel of size mask_grid_size; same random value per patch
    pc = jnp.floor(coord / mask_grid_size).astype(jnp.int32)
    pc = pc - pc.min(axis=1, keepdims=True)
    # hash patch cell -> pseudo-uniform in [0,1) (per-batch seeded)
    seeds = jax.random.randint(k_unit, (b, 1), 0, 2**30, dtype=jnp.int32)
    h = (
        pc[..., 0] * jnp.int32(73856093)
        ^ pc[..., 1] * jnp.int32(19349663)
        ^ pc[..., 2] * jnp.int32(83492791)
    ) ^ seeds
    u = (h.astype(jnp.uint32) % jnp.uint32(1 << 20)).astype(jnp.float32) / float(1 << 20)
    patch_masked = u < rate
    token_mask = patch_masked & mask & sample_on
    # num masked patches ~ unique masked cells; approximate with masked-point
    # count normalized by mean patch size (exact count needs a sort; the
    # weight only rescales the loss)
    n_masked = jnp.maximum(token_mask.sum(-1, keepdims=True), 1)
    # estimate patches = masked points / (points per patch)
    total_valid = jnp.maximum(mask.sum(-1, keepdims=True), 1)
    est_patches = jnp.maximum(
        (n_masked * _estimate_patch_count(pc, mask)) / total_valid, 1.0
    )
    weight = token_mask / est_patches
    return token_mask, weight.astype(jnp.float32)


def _estimate_patch_count(pc: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Approximate number of occupied patches per sample via hash distinctness
    (avoids a device sort; used only for loss weighting)."""
    h = (
        pc[..., 0] * jnp.int32(73856093)
        ^ pc[..., 1] * jnp.int32(19349663)
        ^ pc[..., 2] * jnp.int32(83492791)
    )
    bins = 1024
    hb = (h.astype(jnp.uint32) % jnp.uint32(bins)).astype(jnp.int32)
    hb = jnp.where(mask, hb, bins)
    one_hot = jax.nn.one_hot(hb, bins + 1, dtype=jnp.float32)
    occupied = (one_hot.sum(axis=1)[..., :bins] > 0).sum(-1, keepdims=True)
    return jnp.maximum(occupied.astype(jnp.float32), 1.0)


@MODELS.register_module("SimDINOSSL")
@MODELS.register_module("DefaultContrastiverSimDinoV2", force=True)
class SimDINOSSL(nn.Module):
    """Student backbone + shared DINO/iBOT/MAE heads.

    Teacher forwards reuse this module's ``backbone_apply`` method with the
    EMA parameter copy substituted by the caller (engines/pretrain.py).
    """

    backbone: dict
    dino_out_dim: int = 256
    dino_hidden_dim: int = 2048
    ibot_out_dim: int = 32
    ibot_hidden_dim: int = 256
    enable_mae: bool = False
    mae_out_dim: int = 11

    def setup(self):
        bcfg = dict(self.backbone)
        bcfg["enable_mask_token"] = True
        self.backbone_module = build_model(bcfg)
        self.dino_head = DINOHead(
            out_dim=self.dino_out_dim, hidden_dim=self.dino_hidden_dim,
            bottleneck_dim=self.dino_out_dim,
        )
        self.ibot_head = DINOHead(
            out_dim=self.ibot_out_dim, hidden_dim=self.ibot_hidden_dim,
            bottleneck_dim=self.ibot_out_dim,
        )
        if self.enable_mae:
            self.mae_fc1 = nn.Dense(32)
            self.mae_norm = nn.LayerNorm(epsilon=1e-5)
            self.mae_fc2 = nn.Dense(self.mae_out_dim)

    def backbone_apply(
        self, point: PointBatch, train: bool, token_mask=None, return_enc=True
    ):
        return self.backbone_module(
            point, train=train, token_mask=token_mask, return_enc=return_enc
        )

    def apply_dino_head(self, pooled):
        return self.dino_head(pooled)

    def apply_ibot_head(self, tokens):
        return self.ibot_head(tokens)

    def apply_mae_head(self, tokens):
        x = nn.relu(self.mae_norm(self.mae_fc1(tokens)))
        return self.mae_fc2(x)

    def __call__(self, point: PointBatch, train: bool = False):
        """Plain forward (init path / feature extraction)."""
        dec, enc_feat, enc_mask = self.backbone_apply(point, train)
        pooled = masked_mean_pool(enc_feat, enc_mask)
        _ = self.apply_dino_head(pooled)
        _ = self.apply_ibot_head(dec.feat)
        if self.enable_mae:
            _ = self.apply_mae_head(dec.feat)
        return dec
