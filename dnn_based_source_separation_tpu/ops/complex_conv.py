"""Complex-valued convolutions.

Capability parity: reference `src/modules/conv.py:103` (ComplexConv1d):
(W_r + i W_i) * (x_r + i x_i) via four real convs arranged as two.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ComplexConv1d(nn.Module):
    """(B, T, C_in) complex -> (B, T', C_out) complex."""

    features: int
    kernel_size: int
    strides: int = 1
    padding: str = "VALID"
    use_bias: bool = True

    @nn.compact
    def __call__(self, z):
        conv_r = nn.Conv(self.features, (self.kernel_size,), strides=(self.strides,),
                         padding=self.padding, use_bias=self.use_bias, name="real")
        conv_i = nn.Conv(self.features, (self.kernel_size,), strides=(self.strides,),
                         padding=self.padding, use_bias=self.use_bias, name="imag")
        xr, xi = z.real, z.imag
        yr = conv_r(xr) - conv_i(xi)
        yi = conv_r(xi) + conv_i(xr)
        return yr + 1j * yi


class ComplexDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, z):
        dr = nn.Dense(self.features, use_bias=self.use_bias, name="real")
        di = nn.Dense(self.features, use_bias=self.use_bias, name="imag")
        xr, xi = z.real, z.imag
        return (dr(xr) - di(xi)) + 1j * (dr(xi) + di(xr))
