"""Legacy DINOv2 losses: cls-token DINOLoss and iBOTPatchLoss.

Re-implementation of the reference's (Meta-derived) legacy SSL losses
(pointcept/models/losses/dino_clstoken_loss.py:12-109,
ibot_patch_loss.py:34-151) superseded by MCR/cosine in the shipped SimDINO
configs but kept for capability parity:

  - teacher centering with EMA (center_momentum) lives in a flax "state"
    variable; the DDP async all_reduce of the batch center
    (dino_clstoken_loss.py:91-108) becomes a ``pmean`` over the data mesh
    when ``axis_name`` is set.
  - sinkhorn_knopp_teacher is a fixed-iteration ``lax.fori_loop``.
  - the iBOT masked-patch variant weights per-patch terms and clamps the
    per-sample contribution like the reference forward_masked
    (ibot_patch_loss.py:105-131).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def sinkhorn_knopp_teacher(
    teacher_output: jnp.ndarray,
    teacher_temp: float,
    n_iterations: int = 3,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Sinkhorn-Knopp assignment (reference dino_clstoken_loss.py:38-65).
    teacher_output [B, K] -> assignment [B, K] with columns summing to 1."""
    q = jnp.exp(teacher_output.astype(jnp.float32) / teacher_temp).T  # [K, B]
    b = q.shape[1]
    if axis_name is not None:
        b = b * jax.lax.psum(1, axis_name)
    k = q.shape[0]
    sum_q = q.sum()
    if axis_name is not None:
        sum_q = jax.lax.psum(sum_q, axis_name)
    q = q / sum_q

    def body(_, q):
        rows = q.sum(axis=1, keepdims=True)
        if axis_name is not None:
            rows = jax.lax.psum(rows, axis_name)
        q = q / rows / k
        q = q / q.sum(axis=0, keepdims=True) / b
        return q

    q = jax.lax.fori_loop(0, n_iterations, body, q)
    return (q * b).T


class DINOLoss(nn.Module):
    """Cls-token distillation with EMA centering (reference
    dino_clstoken_loss.py:12-109)."""

    out_dim: int
    student_temp: float = 0.1
    center_momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, student_outputs, teacher_outputs, teacher_temp,
                 update_center: bool = True):
        """student/teacher_outputs: lists of [B, K] logits. Returns scalar."""
        center = self.variable(
            "state", "center", lambda: jnp.zeros((1, self.out_dim), jnp.float32)
        )
        teacher_sm = [
            jax.nn.softmax(
                (t.astype(jnp.float32) - center.value) / teacher_temp, axis=-1
            )
            for t in teacher_outputs
        ]
        total = 0.0
        for s in student_outputs:
            lsm = jax.nn.log_softmax(
                s.astype(jnp.float32) / self.student_temp, axis=-1
            )
            for t in teacher_sm:
                total -= (jax.lax.stop_gradient(t) * lsm).sum(-1).mean()
        if update_center and not self.is_initializing():
            batch = jnp.concatenate(
                [t.astype(jnp.float32) for t in teacher_outputs], axis=0
            )
            bc = batch.mean(axis=0, keepdims=True)
            if self.axis_name is not None:
                bc = jax.lax.pmean(bc, self.axis_name)
            center.value = (
                center.value * self.center_momentum
                + bc * (1 - self.center_momentum)
            )
        return total

    @staticmethod
    def sinkhorn_knopp_teacher(teacher_output, teacher_temp, n_iterations=3,
                               axis_name=None):
        return sinkhorn_knopp_teacher(
            teacher_output, teacher_temp, n_iterations, axis_name
        )


class iBOTPatchLoss(nn.Module):
    """Masked-patch distillation with EMA centering (reference
    ibot_patch_loss.py:34-151). Operates on padded [B, N, K] token logits
    with a bool mask of *masked* (predicted) tokens."""

    patch_out_dim: int
    student_temp: float = 0.1
    center_momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, student_patches, teacher_patches, masks,
                 teacher_temp, update_center: bool = True):
        center = self.variable(
            "state", "center",
            lambda: jnp.zeros((1, 1, self.patch_out_dim), jnp.float32),
        )
        t = jax.nn.softmax(
            (teacher_patches.astype(jnp.float32) - center.value) / teacher_temp,
            axis=-1,
        )
        lsm = jax.nn.log_softmax(
            student_patches.astype(jnp.float32) / self.student_temp, axis=-1
        )
        loss_tok = -(jax.lax.stop_gradient(t) * lsm).sum(-1)  # [B, N]
        w = masks.astype(jnp.float32)
        # per-sample normalization clamped at 1 (reference forward_masked
        # weights 1/max(n_masked, 1) per sample, l.113-127)
        per_sample = (loss_tok * w).sum(-1) / jnp.maximum(w.sum(-1), 1.0)
        loss = per_sample.mean()
        if update_center and not self.is_initializing():
            denom = jnp.maximum(w.sum(), 1.0)
            bc = (teacher_patches.astype(jnp.float32) * w[..., None]).sum(
                axis=(0, 1), keepdims=True
            ) / denom
            if self.axis_name is not None:
                bc = jax.lax.pmean(bc, self.axis_name)
            center.value = (
                center.value * self.center_momentum
                + bc * (1 - self.center_momentum)
            )
        return loss
