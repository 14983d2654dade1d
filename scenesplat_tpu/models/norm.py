"""Mask-aware normalization layers.

The reference normalizes packed [N, C] buffers with torch BatchNorm1d /
LayerNorm; with padded fixed-shape batches the batch statistics must exclude
padding slots, so BatchNorm is reimplemented with masked moments. Conventions
follow torch for checkpoint parity: running = (1-m)*running + m*batch with
unbiased batch variance in the running update and biased variance in the
normalizer (torch.nn.BatchNorm1d semantics; reference uses eps=1e-3,
momentum=0.01 — point_transformer_v3m1_base.py:581).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid points of a [B, N, C] buffer."""

    features: int
    eps: float = 1e-3
    momentum: float = 0.01
    use_running_average: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None  # set for cross-device (sync) BN

    @nn.compact
    def __call__(self, x, mask, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            w = mask[..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            count = jnp.maximum(w.sum(), 1.0)
            mean = (xf * w).sum(axis=(0, 1)) / count
            var = (((xf - mean) ** 2) * w).sum(axis=(0, 1)) / count
            if self.axis_name is not None:
                import jax

                mean = jax.lax.pmean(mean, self.axis_name)
                var = jax.lax.pmean(var, self.axis_name)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """Per-point LayerNorm (torch eps=1e-5); padding-agnostic."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale + bias
        return y.astype(self.dtype)
