"""WaveNet: gated dilated causal conv generative model (mu-law audio).

Capability parity: reference `src/models/wavenet.py` (WaveNet:11,
GatedConv1d:172): 1x1 in -> num_blocks x num_layers gated residual units
(tanh(conv) * sigmoid(conv), dilation 2^i, causal padding) with dual
residual/skip 1x1 heads -> relu/1x1/relu/1x1 (+ output nonlinear).
Supports global ('global') and upsampled local ('local') conditioning.
van den Oord et al., arXiv:1609.03499.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model

EPS = 1e-12


class GatedConv1d(nn.Module):
    """(B, T, C) -> (B, T, out_channels) gated unit with optional conditioning."""

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    causal: bool = True
    conditioning: Optional[str] = None
    enc_dim: Optional[int] = None
    enc_kernel_size: Optional[int] = None
    enc_stride: Optional[int] = None

    @nn.compact
    def __call__(self, x, enc_h=None):
        pad = (self.kernel_size - 1) * self.dilation
        pl, pr = (pad, 0) if self.causal else (pad // 2, pad - pad // 2)
        xp = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
        t = nn.Conv(self.out_channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
                    padding="VALID", use_bias=False, name="tanh_conv1d")(xp)
        s = nn.Conv(self.out_channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
                    padding="VALID", use_bias=False, name="sigmoid_conv1d")(xp)
        if self.conditioning == "global":
            # enc_h: (B, enc_dim) one embedding per utterance.
            t = t + nn.Dense(self.out_channels, name="embed_tanh_linear")(enc_h)[:, None]
            s = s + nn.Dense(self.out_channels, name="embed_sigmoid_linear")(enc_h)[:, None]
        elif self.conditioning == "local":
            # enc_h: (B, T_enc, enc_dim) upsampled by transposed conv.
            up_t = nn.ConvTranspose(self.enc_dim, (self.enc_kernel_size,),
                                    strides=(self.enc_stride,), use_bias=False,
                                    name="embed_tanh_map")(enc_h)
            up_s = nn.ConvTranspose(self.enc_dim, (self.enc_kernel_size,),
                                    strides=(self.enc_stride,), use_bias=False,
                                    name="embed_sigmoid_map")(enc_h)
            T = t.shape[1]
            t = t + nn.Conv(self.out_channels, (1,), use_bias=False, name="embed_tanh_conv1d")(up_t)[:, :T]
            s = s + nn.Conv(self.out_channels, (1,), use_bias=False, name="embed_sigmoid_conv1d")(up_s)[:, :T]
        return jnp.tanh(t) * nn.sigmoid(s)


class ResidualConvBlock1d(nn.Module):
    """Gated conv -> 1x1 residual + 1x1 skip (reference ConvBlock1d)."""

    hidden_channels: int
    skip_channels: int
    kernel_size: int = 3
    num_layers: int = 10
    dilated: bool = True
    causal: bool = True
    conditioning: Optional[str] = None
    enc_dim: Optional[int] = None
    enc_kernel_size: Optional[int] = None
    enc_stride: Optional[int] = None

    @nn.compact
    def __call__(self, x, enc_h=None):
        skip_total = 0.0
        for idx in range(self.num_layers):
            dilation = 2**idx if self.dilated else 1
            residual = x
            h = GatedConv1d(
                self.hidden_channels, self.kernel_size, dilation=dilation,
                causal=self.causal, conditioning=self.conditioning,
                enc_dim=self.enc_dim, enc_kernel_size=self.enc_kernel_size,
                enc_stride=self.enc_stride, name=f"gated{idx}",
            )(x, enc_h=enc_h)
            out = nn.Conv(self.hidden_channels, (1,), use_bias=False, name=f"res{idx}")(h)
            skip = nn.Conv(self.skip_channels, (1,), use_bias=False, name=f"skip{idx}")(h)
            x = out + residual
            skip_total = skip_total + skip
        return x, skip_total


@register_model
class WaveNet(nn.Module, SeparationModelMixin):
    """Public API matches the reference: (B, in_channels, T) -> (B, out_channels, T)."""

    in_channels: int
    out_channels: int
    hidden_channels: int = 256
    skip_channels: int = 256
    kernel_size: int = 3
    num_blocks: int = 3
    num_layers: int = 10
    dilated: bool = True
    causal: bool = True
    output_nonlinear: Optional[str] = None
    conditioning: Optional[str] = None
    enc_dim: Optional[int] = None
    enc_kernel_size: Optional[int] = None
    enc_stride: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, input, enc_h=None):
        x = jnp.moveaxis(input, 1, 2)  # (B, T, C)
        x = nn.Conv(self.hidden_channels, (1,), use_bias=False, name="causal_conv1d")(x)
        skip_total = 0.0
        for idx in range(self.num_blocks):
            x, skip = ResidualConvBlock1d(
                self.hidden_channels, self.skip_channels, self.kernel_size,
                num_layers=self.num_layers, dilated=self.dilated,
                causal=self.causal, conditioning=self.conditioning,
                enc_dim=self.enc_dim, enc_kernel_size=self.enc_kernel_size,
                enc_stride=self.enc_stride, name=f"block{idx}",
            )(x, enc_h=enc_h)
            skip_total = skip_total + skip
        h = nn.relu(skip_total)
        h = nn.Conv(self.hidden_channels, (1,), use_bias=False, name="end0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1,), use_bias=False, name="end1")(h)
        if self.output_nonlinear == "softmax":
            h = nn.softmax(h, axis=-1)
        elif self.output_nonlinear == "sigmoid":
            h = nn.sigmoid(h)
        elif self.output_nonlinear is not None:
            raise ValueError(f"Unsupported output nonlinearity: {self.output_nonlinear}")
        return jnp.moveaxis(h, 1, 2)
