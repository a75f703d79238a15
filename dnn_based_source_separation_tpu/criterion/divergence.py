"""Divergences: KL, Itakura-Saito, generalized KL, beta-divergence.

Capability parity: reference `src/criterion/divergence.py:6-170`. Used by
NMF multiplicative updates and spectrogram criteria.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def kl_divergence(input, target, eps: float = EPS):
    """sum target * log(target/input); inputs are nonnegative spectra."""
    ratio = (target + eps) / (input + eps)
    return jnp.sum(target * jnp.log(ratio), axis=-1)


def generalized_kl_divergence(input, target, eps: float = EPS):
    ratio = (target + eps) / (input + eps)
    return jnp.sum(target * jnp.log(ratio) - target + input, axis=-1)


def is_divergence(input, target, eps: float = EPS):
    """Itakura-Saito: sum target/input - log(target/input) - 1."""
    ratio = (target + eps) / (input + eps)
    return jnp.sum(ratio - jnp.log(ratio) - 1.0, axis=-1)


def beta_divergence(input, target, beta: float = 2.0, eps: float = EPS):
    """Beta divergence family; beta=0 IS, beta=1 gen-KL, beta=2 Euclidean."""
    if beta == 0.0:
        return is_divergence(input, target, eps=eps)
    if beta == 1.0:
        return generalized_kl_divergence(input, target, eps=eps)
    x, y = input + eps, target + eps
    term = (
        jnp.power(y, beta)
        + (beta - 1.0) * jnp.power(x, beta)
        - beta * y * jnp.power(x, beta - 1.0)
    ) / (beta * (beta - 1.0))
    return jnp.sum(term, axis=-1)
