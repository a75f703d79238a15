"""Pooling primitives: global avg/max, stochastic, median, GeM.

Capability parity: reference `src/modules/pool.py:11-292` (GlobalAvgPool,
GlobalMaxPool, StochasticPool, MedianPool, GeneralizedMeanPool). Channels-
last pure functions + thin flax wrappers where parameters are involved.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def global_avg_pool(x, axis=(1,)):
    """Mean over spatial axes; x channels-last."""
    return jnp.mean(x, axis=axis)


def global_max_pool(x, axis=(1,)):
    return jnp.max(x, axis=axis)


def median_pool1d(x, kernel_size: int, stride: int | None = None):
    """(B, T, C) -> (B, T', C) median over sliding windows."""
    stride = stride or kernel_size
    T = x.shape[1]
    n = (T - kernel_size) // stride + 1
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(kernel_size)[None, :]
    windows = x[:, idx]  # (B, n, k, C)
    return jnp.median(windows, axis=2)


def stochastic_pool1d(x, kernel_size: int, key, stride: int | None = None):
    """Training-time stochastic pooling: sample by activation weight."""
    stride = stride or kernel_size
    T = x.shape[1]
    n = (T - kernel_size) // stride + 1
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(kernel_size)[None, :]
    windows = x[:, idx]  # (B, n, k, C)
    w = jnp.maximum(windows, 0.0)
    probs = w / (jnp.sum(w, axis=2, keepdims=True) + 1e-12)
    logits = jnp.log(probs + 1e-12)
    choice = jax.random.categorical(key, jnp.moveaxis(logits, 2, -1), axis=-1)
    return jnp.take_along_axis(windows, choice[:, :, None, :], axis=2)[:, :, 0]


class GeneralizedMeanPool(nn.Module):
    """GeM: (mean |x|^p)^(1/p) with learnable p (reference pool.py GeM)."""

    p_init: float = 3.0
    axis: int = 1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        p = self.param("p", lambda k: jnp.asarray(self.p_init, jnp.float32))
        x = jnp.maximum(x, self.eps)
        return jnp.mean(x**p, axis=self.axis) ** (1.0 / p)
