"""Lovasz-softmax loss (reference: pointcept/models/losses/lovasz.py, 257 LoC).

Fixed-shape jit formulation: invalid/ignored points get error -inf so they
sort last, and the Lovasz-gradient dot product is truncated at the valid
count, which reproduces the dynamic-shape semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .builder import LOSSES


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors ([P] floats)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@LOSSES.register_module()
class LovaszLoss:
    def __init__(self, mode: str = "multiclass", loss_weight: float = 1.0,
                 ignore_index: int = -1):
        assert mode in ("multiclass", "binary")
        self.mode = mode
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, target, mask=None, **kwargs):
        num_classes = pred.shape[-1]
        logits = pred.reshape(-1, num_classes).astype(jnp.float32)
        labels = target.reshape(-1)
        valid = labels != self.ignore_index
        if mask is not None:
            valid = valid & mask.reshape(-1)
        probs = jax.nn.softmax(logits, axis=-1)
        n_valid = valid.sum()
        pos = jnp.arange(labels.shape[0])

        def class_loss(c):
            fg = ((labels == c) & valid).astype(jnp.float32)
            present = fg.sum() > 0
            errors = jnp.abs(fg - probs[:, c])
            errors = jnp.where(valid, errors, -jnp.inf)  # invalid sort last
            order = jnp.argsort(-errors)
            errors_sorted = errors[order]
            fg_sorted = fg[order]
            grad = _lovasz_grad(fg_sorted)
            in_valid = pos < n_valid
            loss_c = jnp.sum(
                jnp.where(in_valid, jnp.maximum(errors_sorted, 0.0) * grad, 0.0)
            )
            return loss_c, present

        losses, presents = jax.vmap(class_loss)(jnp.arange(num_classes))
        n_present = jnp.maximum(presents.sum(), 1)
        loss = jnp.where(presents, losses, 0.0).sum() / n_present
        return self.loss_weight * loss
