"""Complex-aware and concatenated activations.

Capability parity: reference `src/modules/activation.py:7-135` (ConcatReLU,
ModReLU, ComplexReLU, ZReLU).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def concat_relu(x, axis: int = -1):
    """CReLU: concat(relu(x), relu(-x))."""
    return jnp.concatenate([nn.relu(x), nn.relu(-x)], axis=axis)


def complex_relu(z):
    """ReLU applied to real and imaginary parts independently."""
    return nn.relu(z.real) + 1j * nn.relu(z.imag)


def zrelu(z):
    """Pass z only when both real and imaginary parts are positive."""
    keep = (z.real > 0) & (z.imag > 0)
    return jnp.where(keep, z, 0.0 + 0.0j)


class ModReLU(nn.Module):
    """relu(|z| + b) * z/|z| with learnable per-feature bias b."""

    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, z):
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mag = jnp.abs(z)
        scale = nn.relu(mag + b) / (mag + self.eps)
        return scale * z
