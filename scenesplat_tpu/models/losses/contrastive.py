"""Class-aggregated contrastive loss for VL pretraining.

Fixed-shape re-formulation of the reference AggregatedContrastiveLoss
(pointcept/models/losses/misc.py:298-421): for every semantic class present in
the batch, split its valid Gaussians into two groups, sum-pool each group's
predicted features, L2-normalize, and apply a symmetric InfoNCE over classes.

Deviations for jit-compatibility (documented, training-equivalent):
  - the per-class random half/half split becomes an i.i.d. Bernoulli(0.5)
    point assignment (group sizes concentrate at half; aggregates are
    L2-normalized so the scale difference is immaterial);
  - classes are bucketed into a static ``num_classes`` table; absent or
    under-populated classes are masked out of both CE directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import LOSSES


@LOSSES.register_module()
class AggregatedContrastiveLoss:
    def __init__(
        self,
        temperature: float = 0.2,
        reduction: str = "mean",
        loss_weight: float = 1.0,
        schedule: str = "all",
        num_classes: int = 256,
        min_samples: int = 100,
    ):
        self.temperature = temperature
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.schedule = schedule
        self.num_classes = num_classes
        self.min_samples = min_samples
        if schedule.startswith("last_"):
            self.last_percent = float(schedule.split("_")[-1]) / 100.0
        else:
            self.last_percent = None

    def __call__(
        self,
        pred,
        target,
        valid_feat_mask=None,
        mask=None,
        segment=None,
        epoch_progress=None,
        rng=None,
        **kwargs,
    ):
        if self.schedule == "skip" or segment is None:
            return jnp.asarray(0.0, jnp.float32)

        c = self.num_classes
        pf = pred.astype(jnp.float32).reshape(-1, pred.shape[-1])
        seg = segment.reshape(-1)
        valid = seg >= 0
        if valid_feat_mask is not None:
            valid = valid & valid_feat_mask.reshape(-1).astype(bool)
        if mask is not None:
            valid = valid & mask.reshape(-1)
        valid = valid & (seg < c)
        seg_safe = jnp.where(valid, seg, c)  # c = discard bin

        if rng is None:
            rng = jax.random.PRNGKey(0)
        in_a = jax.random.bernoulli(rng, 0.5, seg.shape)

        w_a = (valid & in_a).astype(jnp.float32)[:, None]
        w_b = (valid & ~in_a).astype(jnp.float32)[:, None]
        agg_a = jax.ops.segment_sum(pf * w_a, seg_safe, num_segments=c + 1)[:c]
        agg_b = jax.ops.segment_sum(pf * w_b, seg_safe, num_segments=c + 1)[:c]
        cnt_a = jax.ops.segment_sum(w_a[:, 0], seg_safe, num_segments=c + 1)[:c]
        cnt_b = jax.ops.segment_sum(w_b[:, 0], seg_safe, num_segments=c + 1)[:c]

        used = (cnt_a + cnt_b >= self.min_samples) & (cnt_a > 0) & (cnt_b > 0)
        n_used = used.sum()

        na = jnp.linalg.norm(agg_a, axis=-1, keepdims=True)
        nb = jnp.linalg.norm(agg_b, axis=-1, keepdims=True)
        agg_a = agg_a / jnp.maximum(na, 1e-12)
        agg_b = agg_b / jnp.maximum(nb, 1e-12)

        logits = (agg_a @ agg_b.T) / self.temperature  # [C, C]
        neg_inf = jnp.asarray(-1e9, jnp.float32)
        col_bias = jnp.where(used[None, :], 0.0, neg_inf)

        def masked_ce(lg):
            # unused columns excluded from the softmax; unused rows excluded
            # from the average
            lg = lg + col_bias
            logp = jax.nn.log_softmax(lg, axis=-1)
            diag = jnp.diagonal(logp)
            return -(diag * used).sum() / jnp.maximum(n_used, 1)

        loss = 0.5 * (masked_ce(logits) + masked_ce(logits.T))
        loss = jnp.where(n_used > 0, loss, 0.0)
        if self.reduction == "sum":
            loss = loss * n_used

        if self.last_percent is not None:
            if epoch_progress is None:
                gate = 1.0
            else:
                gate = jnp.where(
                    jnp.asarray(epoch_progress) > (1.0 - self.last_percent), 1.0, 0.0
                )
            loss = loss * gate
        return self.loss_weight * loss
