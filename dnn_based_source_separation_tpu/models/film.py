"""FiLM and PoCM conditioning primitives.

Capability parity: reference `src/models/film.py:10-176` (FiLM/FiLM1d/2d)
and `src/models/pocm.py:9-94` (PoCM2d, GPoCM2d from LaSAFT,
arXiv:2010.11631). Pure functions on channels-last tensors.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def film(x, gamma, beta):
    """x: (B, ..., C); gamma/beta: (B, C) broadcast over spatial dims."""
    expand = (1,) * (x.ndim - 2)
    g = gamma.reshape(gamma.shape[0], *expand, gamma.shape[-1])
    b = beta.reshape(beta.shape[0], *expand, beta.shape[-1])
    return g * x + b


def pocm(x, gamma, beta):
    """Point-wise convolutional modulation.

    x: (B, ..., C_in); gamma: (B, C_out, C_in); beta: (B, C_out).
    y[b, ..., c'] = sum_c gamma[b, c', c] x[b, ..., c] + beta[b, c'].
    """
    y = jnp.einsum("b...c,bdc->b...d", x, gamma)
    expand = (1,) * (x.ndim - 2)
    return y + beta.reshape(beta.shape[0], *expand, beta.shape[-1])


def gpocm(x, gamma, beta):
    """Gated PoCM: sigmoid(PoCM(x)) * x (square gamma)."""
    return nn.sigmoid(pocm(x, gamma, beta)) * x


# Aliases mirroring the reference class names (operating channels-last).
FiLM = film
FiLM1d = film
FiLM2d = film
PoCM2d = pocm
GPoCM2d = gpocm
