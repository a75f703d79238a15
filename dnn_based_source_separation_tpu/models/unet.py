"""Generic 1-D/2-D U-Nets (+ ensembles).

Capability parity: reference `src/models/unet.py` (UNet1d:55, UNet2d:103,
EnsembleUNet1d/2d:151/229, Encoder/Decoder blocks :310-846): strided conv
encoder blocks with BN + nonlinearity, transposed-conv decoder blocks with
skip concatenation and crop, final crop back to the input grid.

TPU-first: NWC/NHWC layouts; the reference's adaptive "same-ish" padding
arithmetic is kept (Python ints from static shapes).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model
from .modules import choose_nonlinear

EPS = 1e-12


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _per_block(v, n):
    if isinstance(v, (list, tuple)) and len(v) == n and not isinstance(v[0], int):
        return list(v)
    if isinstance(v, (list, tuple)) and len(v) == n and isinstance(v[0], (list, tuple)):
        return list(v)
    return [v] * n


class EncoderBlock2d(nn.Module):
    """pad -> strided conv -> BN -> nonlinear (reference :649)."""

    out_channels: int
    kernel_size: Any
    stride: Any = None
    dilation: Any = 1
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride if self.stride is not None else self.kernel_size)
        dh, dw = _pair(self.dilation)
        ekh, ekw = (kh - 1) * dh + 1, (kw - 1) * dw + 1
        H, W = x.shape[1], x.shape[2]
        ph = ekh - 1 - (sh - (H - ekh) % sh) % sh
        pw = ekw - 1 - (sw - (W - ekw) % sw) % sw
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
        x = nn.Conv(self.out_channels, (kh, kw), strides=(sh, sw),
                    kernel_dilation=(dh, dw), padding="VALID", name="conv2d")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm2d")(x)
        return choose_nonlinear(self.nonlinear)(x)


class DecoderBlock2d(nn.Module):
    """[concat skip] -> transposed conv -> crop -> BN -> nonlinear (:771)."""

    out_channels: int
    kernel_size: Any
    stride: Any = None
    dilation: Any = 1
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride if self.stride is not None else self.kernel_size)
        dh, dw = _pair(self.dilation)
        ekh, ekw = (kh - 1) * dh + 1, (kw - 1) * dw + 1
        if skip is not None:
            # Match x to the skip size: upsampled maps can be larger OR
            # smaller than the skip (ceil-padded encoders), so crop the
            # excess and pad the deficit.
            dhh, dww = skip.shape[1] - x.shape[1], skip.shape[2] - x.shape[2]
            ch, cw = max(0, -dhh), max(0, -dww)
            x = x[:, ch // 2 : x.shape[1] - (ch - ch // 2),
                  cw // 2 : x.shape[2] - (cw - cw // 2)]
            ph2, pw2 = max(0, dhh), max(0, dww)
            x = jnp.pad(x, ((0, 0), (ph2 // 2, ph2 - ph2 // 2), (pw2 // 2, pw2 - pw2 // 2), (0, 0)))
            x = jnp.concatenate([x, skip], axis=-1)
        x = nn.ConvTranspose(self.out_channels, (kh, kw), strides=(sh, sw),
                             kernel_dilation=(dh, dw), padding="VALID", name="deconv2d")(x)
        ph, pw = ekh - sh, ekw - sw
        x = x[:, ph // 2 : x.shape[1] - (ph - ph // 2) or None,
              pw // 2 : x.shape[2] - (pw - pw // 2) or None]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm2d")(x)
        return choose_nonlinear(self.nonlinear)(x)


@register_model
class UNet2d(nn.Module, SeparationModelMixin):
    """(B, C_in, H, W) -> (B, C_out, H, W) (reference UNet2d:103)."""

    channels: Sequence[int]
    kernel_size: Any
    stride: Any = None
    dilated: bool = False
    enc_nonlinear: Any = "relu"
    dec_nonlinear: Any = "relu"
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        channels = list(self.channels)
        n = len(channels) - 1
        enc_nl = self.enc_nonlinear if isinstance(self.enc_nonlinear, (list, tuple)) else [self.enc_nonlinear] * n
        dec_nl = self.dec_nonlinear if isinstance(self.dec_nonlinear, (list, tuple)) else [self.dec_nonlinear] * n
        dec_channels = channels[::-1] if self.out_channels is None else channels[:0:-1] + [self.out_channels]

        x = jnp.transpose(input, (0, 2, 3, 1))  # NHWC
        H_in, W_in = x.shape[1], x.shape[2]

        skips = []
        for i in range(n):
            dilation = 2**i if self.dilated else 1
            stride = 1 if self.dilated else self.stride
            x = EncoderBlock2d(
                channels[i + 1], self.kernel_size, stride=stride,
                dilation=dilation, nonlinear=enc_nl[i], eps=self.eps,
                name=f"encoder{i}",
            )(x, train=train)
            skips.append(x)

        x = nn.Conv(channels[-1], (1, 1), name="bottleneck")(x)

        rev = skips[::-1]
        for i in range(n):
            dilation = 2 ** (n - i - 1) if self.dilated else 1
            stride = 1 if self.dilated else self.stride
            x = DecoderBlock2d(
                dec_channels[i + 1], self.kernel_size, stride=stride,
                dilation=dilation, nonlinear=dec_nl[i], eps=self.eps,
                name=f"decoder{i}",
            )(x, skip=None if i == 0 else rev[i], train=train)

        # Crop spatial overshoot back to the input grid.
        dh, dw = x.shape[1] - H_in, x.shape[2] - W_in
        x = x[:, dh // 2 : x.shape[1] - (dh - dh // 2), dw // 2 : x.shape[2] - (dw - dw // 2)]
        return jnp.transpose(x, (0, 3, 1, 2))


class EncoderBlock1d(nn.Module):
    out_channels: int
    kernel_size: int
    stride: Optional[int] = None
    dilation: int = 1
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        s = self.stride if self.stride is not None else k
        d = self.dilation
        ek = (k - 1) * d + 1
        T = x.shape[1]
        p = ek - 1 - (s - (T - ek) % s) % s
        x = jnp.pad(x, ((0, 0), (p // 2, p - p // 2), (0, 0)))
        x = nn.Conv(self.out_channels, (k,), strides=(s,), kernel_dilation=(d,),
                    padding="VALID", name="conv1d")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm1d")(x)
        return choose_nonlinear(self.nonlinear)(x)


class DecoderBlock1d(nn.Module):
    out_channels: int
    kernel_size: int
    stride: Optional[int] = None
    dilation: int = 1
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        k = self.kernel_size
        s = self.stride if self.stride is not None else k
        d = self.dilation
        ek = (k - 1) * d + 1
        if skip is not None:
            dt = skip.shape[1] - x.shape[1]
            x = jnp.pad(x, ((0, 0), (dt // 2, dt - dt // 2), (0, 0)))
            x = jnp.concatenate([x, skip], axis=-1)
        x = nn.ConvTranspose(self.out_channels, (k,), strides=(s,), kernel_dilation=(d,), padding="VALID", name="deconv1d")(x)
        p = ek - s
        x = x[:, p // 2 : x.shape[1] - (p - p // 2) or None]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm1d")(x)
        return choose_nonlinear(self.nonlinear)(x)


@register_model
class UNet1d(nn.Module, SeparationModelMixin):
    """(B, C_in, T) -> (B, C_out, T) (reference UNet1d:55)."""

    channels: Sequence[int]
    kernel_size: int
    stride: Optional[int] = None
    dilated: bool = False
    enc_nonlinear: Any = "relu"
    dec_nonlinear: Any = "relu"
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        channels = list(self.channels)
        n = len(channels) - 1
        enc_nl = self.enc_nonlinear if isinstance(self.enc_nonlinear, (list, tuple)) else [self.enc_nonlinear] * n
        dec_nl = self.dec_nonlinear if isinstance(self.dec_nonlinear, (list, tuple)) else [self.dec_nonlinear] * n
        dec_channels = channels[::-1] if self.out_channels is None else channels[:0:-1] + [self.out_channels]

        x = jnp.moveaxis(input, 1, 2)  # (B, T, C)
        T_in = x.shape[1]
        skips = []
        for i in range(n):
            dilation = 2**i if self.dilated else 1
            stride = 1 if self.dilated else self.stride
            x = EncoderBlock1d(channels[i + 1], self.kernel_size, stride=stride,
                               dilation=dilation, nonlinear=enc_nl[i], eps=self.eps,
                               name=f"encoder{i}")(x, train=train)
            skips.append(x)
        x = nn.Conv(channels[-1], (1,), name="bottleneck")(x)
        rev = skips[::-1]
        for i in range(n):
            dilation = 2 ** (n - i - 1) if self.dilated else 1
            stride = 1 if self.dilated else self.stride
            x = DecoderBlock1d(dec_channels[i + 1], self.kernel_size, stride=stride,
                               dilation=dilation, nonlinear=dec_nl[i], eps=self.eps,
                               name=f"decoder{i}")(x, skip=None if i == 0 else rev[i], train=train)
        dt = x.shape[1] - T_in
        x = x[:, dt // 2 : x.shape[1] - (dt - dt // 2)]
        return jnp.moveaxis(x, 1, 2)


@register_model
class EnsembleUNet2d(nn.Module, SeparationModelMixin):
    """Stack of U-Nets applied sequentially, optionally returning every
    stage's output (reference EnsembleUNet2d:229)."""

    channels: Sequence[int]
    kernel_size: Any
    num_stages: int = 2
    stride: Any = None
    dilated: bool = False
    enc_nonlinear: Any = "relu"
    dec_nonlinear: Any = "relu"
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False, return_all_layers: bool = False):
        outputs = []
        x = input
        for idx in range(self.num_stages):
            x = UNet2d(
                self.channels, self.kernel_size, stride=self.stride,
                dilated=self.dilated, enc_nonlinear=self.enc_nonlinear,
                dec_nonlinear=self.dec_nonlinear, out_channels=self.out_channels,
                eps=self.eps, name=f"unet{idx}",
            )(x, train=train)
            outputs.append(x)
        if return_all_layers:
            return jnp.stack(outputs, axis=1)
        return x


@register_model
class EnsembleUNet1d(nn.Module, SeparationModelMixin):
    """1-D ensemble counterpart (reference EnsembleUNet1d:151)."""

    channels: Sequence[int]
    kernel_size: int
    num_stages: int = 2
    stride: Optional[int] = None
    dilated: bool = False
    enc_nonlinear: Any = "relu"
    dec_nonlinear: Any = "relu"
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False, return_all_layers: bool = False):
        outputs = []
        x = input
        for idx in range(self.num_stages):
            x = UNet1d(
                self.channels, self.kernel_size, stride=self.stride,
                dilated=self.dilated, enc_nonlinear=self.enc_nonlinear,
                dec_nonlinear=self.dec_nonlinear, out_channels=self.out_channels,
                eps=self.eps, name=f"unet{idx}",
            )(x, train=train)
            outputs.append(x)
        if return_all_layers:
            return jnp.stack(outputs, axis=1)
        return x
