"""Conditioned U-Net (CUNet): FiLM/PoCM-conditioned encoder blocks.

Capability parity: reference `src/models/cunet.py` (ConditionedUNet2d:35,
UNet2d:83, Encoder/DecoderBlock2d:280/340, ControlDenseNet:671,
ControlConvNet:811): a control network maps a one-hot instrument vector to
per-encoder-layer (gamma, beta); each encoder block applies conv -> BN ->
conditioning -> nonlinear; optional output masking.
Meseguer-Brocal & Peeters, arXiv:1907.01277; LaSAFT conditioning variants.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model
from .film import film, gpocm, pocm
from .modules import choose_nonlinear
from .unet import DecoderBlock2d, _pair

EPS = 1e-12


class ControlDenseNet(nn.Module):
    """One-hot latent -> stacked dense -> per-layer (gamma, beta) lists.

    out_channels[i] gives the conditioned channel count of encoder layer i;
    gamma_shapes='vector' emits (B, C) FiLM params, 'matrix' emits
    (B, C, C) PoCM params.
    """

    channels: Sequence[int]
    out_channels: Sequence[int]
    nonlinear: Any = "relu"
    gamma_shape: str = "vector"

    @nn.compact
    def __call__(self, latent):
        x = latent
        n_blocks = len(self.channels) - 1
        nls = self.nonlinear if isinstance(self.nonlinear, (list, tuple)) else [self.nonlinear] * n_blocks
        for i in range(n_blocks):
            x = nn.Dense(self.channels[i + 1], name=f"dense{i}")(x)
            x = choose_nonlinear(nls[i])(x)
        gammas, betas = [], []
        for i, c in enumerate(self.out_channels):
            if self.gamma_shape == "matrix":
                g = nn.Dense(c * c, name=f"fc_weight{i}")(x).reshape(-1, c, c)
            else:
                g = nn.Dense(c, name=f"fc_weight{i}")(x)
            b = nn.Dense(c, name=f"fc_bias{i}")(x)
            gammas.append(g)
            betas.append(b)
        return gammas, betas


class ControlConvNet(nn.Module):
    """1-D conv control network variant (reference ControlConvNet:811)."""

    channels: Sequence[int]
    out_channels: Sequence[int]
    kernel_size: int = 3
    stride: int = 2
    nonlinear: Any = "relu"
    gamma_shape: str = "vector"

    @nn.compact
    def __call__(self, latent):
        """latent: (B, T, C_in) conditioning sequence."""
        x = latent
        n_blocks = len(self.channels) - 1
        nls = self.nonlinear if isinstance(self.nonlinear, (list, tuple)) else [self.nonlinear] * n_blocks
        for i in range(n_blocks):
            x = nn.Conv(self.channels[i + 1], (self.kernel_size,), strides=(self.stride,), name=f"conv{i}")(x)
            x = choose_nonlinear(nls[i])(x)
        x = jnp.mean(x, axis=1)  # global pool over the control sequence
        gammas, betas = [], []
        for i, c in enumerate(self.out_channels):
            if self.gamma_shape == "matrix":
                g = nn.Dense(c * c, name=f"fc_weight{i}")(x).reshape(-1, c, c)
            else:
                g = nn.Dense(c, name=f"fc_weight{i}")(x)
            b = nn.Dense(c, name=f"fc_bias{i}")(x)
            gammas.append(g)
            betas.append(b)
        return gammas, betas


class ConditionedEncoderBlock2d(nn.Module):
    """pad -> conv -> BN -> conditioning(gamma, beta) -> nonlinear."""

    out_channels: int
    kernel_size: Any
    stride: Any = None
    dilation: Any = 1
    nonlinear: Optional[str] = "leaky-relu"
    conditioning: str = "film"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, gamma, beta, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride if self.stride is not None else self.kernel_size)
        dh, dw = _pair(self.dilation)
        ekh, ekw = (kh - 1) * dh + 1, (kw - 1) * dw + 1
        H, W = x.shape[1], x.shape[2]
        ph = ekh - 1 - (sh - (H - ekh) % sh) % sh
        pw = ekw - 1 - (sw - (W - ekw) % sw) % sw
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
        x = nn.Conv(self.out_channels, (kh, kw), strides=(sh, sw),
                    kernel_dilation=(dh, dw), padding="VALID", use_bias=False, name="conv2d")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm2d")(x)
        cond = {"film": film, "pocm": pocm, "gpocm": gpocm}[self.conditioning]
        x = cond(x, gamma, beta)
        return choose_nonlinear(self.nonlinear)(x)


@register_model
class ConditionedUNet2d(nn.Module, SeparationModelMixin):
    """FiLM-conditioned U-Net.

    __call__(input (B, C, H, W), latent (B, latent_dim) one-hot) -> same
    shape (optionally masked against the input).
    """

    channels: Sequence[int]
    kernel_size: Any
    stride: Any = None
    control_channels: Sequence[int] = (4, 16, 64)
    enc_nonlinear: Any = "leaky-relu"
    dec_nonlinear: Any = "leaky-relu"
    out_channels: Optional[int] = None
    conditioning: str = "film"
    masking: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, input, latent, train: bool = False):
        channels = list(self.channels)
        n = len(channels) - 1
        enc_nl = self.enc_nonlinear if isinstance(self.enc_nonlinear, (list, tuple)) else [self.enc_nonlinear] * n
        dec_nl = self.dec_nonlinear if isinstance(self.dec_nonlinear, (list, tuple)) else [self.dec_nonlinear] * n
        dec_channels = channels[::-1] if self.out_channels is None else channels[:0:-1] + [self.out_channels]

        gamma_shape = "matrix" if self.conditioning in ("pocm", "gpocm") else "vector"
        gammas, betas = ControlDenseNet(
            self.control_channels, channels[1:], gamma_shape=gamma_shape, name="control_net",
        )(latent)

        x = jnp.transpose(input, (0, 2, 3, 1))
        H_in, W_in = x.shape[1], x.shape[2]
        skips = []
        for i in range(n):
            x = ConditionedEncoderBlock2d(
                channels[i + 1], self.kernel_size, stride=self.stride,
                nonlinear=enc_nl[i], conditioning=self.conditioning,
                eps=self.eps, name=f"encoder{i}",
            )(x, gammas[i], betas[i], train=train)
            skips.append(x)

        x = nn.Conv(channels[-1], (1, 1), name="bottleneck")(x)

        rev = skips[::-1]
        for i in range(n):
            x = DecoderBlock2d(
                dec_channels[i + 1], self.kernel_size, stride=self.stride,
                nonlinear=dec_nl[i], eps=self.eps, name=f"decoder{i}",
            )(x, skip=None if i == 0 else rev[i], train=train)

        dh, dw = x.shape[1] - H_in, x.shape[2] - W_in
        ch, cw = max(0, dh), max(0, dw)
        x = x[:, ch // 2 : x.shape[1] - (ch - ch // 2), cw // 2 : x.shape[2] - (cw - cw // 2)]
        ph2, pw2 = max(0, -dh), max(0, -dw)
        x = jnp.pad(x, ((0, 0), (ph2 // 2, ph2 - ph2 // 2), (pw2 // 2, pw2 - pw2 // 2), (0, 0)))
        x = jnp.transpose(x, (0, 3, 1, 2))
        if self.masking:
            x = x * input
        return x
