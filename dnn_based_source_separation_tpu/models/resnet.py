"""Bottleneck residual block (HRNet building block).

Capability parity: reference `src/models/resnet.py:8-56` (ResidualBlock2d):
1x1 reduce -> BN -> nl -> 3x3 -> BN -> nl -> 1x1 expand -> BN (+1x1 skip
when channels change) -> nl. NHWC.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .modules import choose_nonlinear

EPS = 1e-12


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class ResidualBlock2d(nn.Module):
    out_channels: int
    bottleneck_channels: int
    kernel_size: Any = (3, 3)
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        nl = choose_nonlinear(self.nonlinear)
        in_channels = x.shape[-1]

        h = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False, name="bottleneck_conv2d_in")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="bottleneck_norm2d_in")(h)
        h = nl(h)
        pads = (((kh - 1) // 2, (kh - 1) - (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) - (kw - 1) // 2))
        h = nn.Conv(self.bottleneck_channels, (kh, kw), padding=pads, use_bias=False, name="conv2d")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm2d")(h)
        h = nl(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="bottleneck_conv2d_out")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="bottleneck_norm2d_out")(h)

        if self.out_channels != in_channels:
            residual = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="pointwise_conv2d")(x)
        else:
            residual = x
        return nl(h + residual)
