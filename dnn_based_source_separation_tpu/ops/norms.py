"""TasNet normalization primitives: global LN and cumulative (causal) LN.

Capability parity: reference `src/modules/norm.py:11-116` (`GlobalLayerNorm`,
`CumulativeLayerNorm1d`). TPU-first: channels-last (..., T, N); cLN's
running statistics map to a single `jnp.cumsum` over the frame axis (the
reference computes the same cumulative sums, torch-side).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def global_layer_norm(x, gamma, beta, eps: float = 1e-8):
    """Normalize over (T, N) jointly per sample. x: (..., T, N)."""
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
    return gamma * (x - mean) / jnp.sqrt(var + eps) + beta


def cumulative_layer_norm(x, gamma, beta, eps: float = 1e-8):
    """Causal layer norm: stats over channels and all frames <= t.

    x: (..., T, N); gamma/beta: (N,).
    """
    N = x.shape[-1]
    t_count = jnp.arange(1, x.shape[-2] + 1, dtype=x.dtype)[:, None] * N  # (T,1)
    cum_sum = jnp.cumsum(jnp.sum(x, axis=-1, keepdims=True), axis=-2)
    cum_sq = jnp.cumsum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), axis=-2)
    mean = cum_sum / t_count
    var = cum_sq / t_count - jnp.square(mean)
    return gamma * (x - mean) / jnp.sqrt(var + eps) + beta


class GlobalLayerNorm(nn.Module):
    """gLN over (T, N) for channels-last inputs (..., T, N)."""

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        return global_layer_norm(x, gamma, beta, self.eps)


class CumulativeLayerNorm(nn.Module):
    """Causal cLN for channels-last inputs (..., T, N)."""

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        return cumulative_layer_norm(x, gamma, beta, self.eps)


class ChannelLayerNorm(nn.Module):
    """Per-frame LayerNorm over channels only (UMX/dual-path style)."""

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


def choose_layer_norm(kind: str, features: int, causal: bool = False, eps: float = 1e-8):
    """Factory mirroring reference `src/utils/tasnet.py:14` (choose_layer_norm)."""
    if kind in ("cLN",) or causal:
        return CumulativeLayerNorm(features, eps=eps)
    if kind in ("gLN", "global"):
        return GlobalLayerNorm(features, eps=eps)
    if kind in ("LN", "layer", "channel"):
        return ChannelLayerNorm(features, eps=eps)
    raise ValueError(f"Unsupported layer norm: {kind}")
