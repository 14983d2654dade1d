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


class PDNorm(nn.Module):
    """Prompt-driven (dataset-conditioned) normalization (reference:
    pointcept/models/point_prompt_training/prompt_driven_normalization.py:8).

    Holds one norm per condition; the active one is selected per batch by an
    integer condition index. With ``decouple=False`` a single shared norm is
    used; ``adaptive`` adds a context-conditioned affine (PPT language-guided
    variant).
    """

    features: int
    conditions: tuple = ("ScanNet", "S3DIS", "Structured3D")
    norm_type: str = "ln"  # "ln" | "bn"
    decouple: bool = True
    adaptive: bool = False
    context_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, condition_index, mask=None, context=None,
                 use_running_average: bool = True):
        n_norms = len(self.conditions) if self.decouple else 1
        cidx = jnp.clip(condition_index, 0, n_norms - 1)

        if self.norm_type == "ln":
            outs = [
                LayerNorm(self.features, dtype=self.dtype, name=f"norm{i}")(x)
                for i in range(n_norms)
            ]
        else:
            outs = [
                MaskedBatchNorm(self.features, dtype=self.dtype, name=f"norm{i}")(
                    x, mask, use_running_average=use_running_average
                )
                for i in range(n_norms)
            ]
        if n_norms == 1:
            y = outs[0]
        else:
            stacked = jnp.stack(outs)  # [C, B, N, F]
            y = jnp.take(stacked, cidx, axis=0)
            if y.ndim == x.ndim + 1:  # per-batch condition [B]
                y = jnp.take_along_axis(
                    stacked, cidx.reshape(1, -1, 1, 1).astype(jnp.int32), axis=0
                )[0]
        if self.adaptive and context is not None:
            # reference modulation = Sequential(SiLU, Linear(bias=True))
            # (prompt_driven_normalization.py:28-30, PDBatchNorm l.59-61)
            mod = nn.Dense(2 * self.features, name="modulation")(
                nn.silu(context)
            )
            shift, scale = jnp.split(mod, 2, axis=-1)
            y = y * (1 + scale[:, None, :]) + shift[:, None, :]
        return y
