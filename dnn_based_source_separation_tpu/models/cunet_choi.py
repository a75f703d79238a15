"""Choi-style conditioned TDC U-Net (cunet_choi).

Capability parity: reference `egs/musdb18/cunet_choi/src/adhoc_model.py`
(TDCUNet2d:73, TDCEncoder2d:172, TDCDecoder2d:209, TDCEncoderBlock2d:263,
TDCDecoderBlock2d:318, PreprocessBlock:379, PostprocessBlock:410) built on
`src/models/cunet.py` TDC2d:546 / TDCTransformBlock2d:579. The reference's
TDF* companions raise NotImplementedError ("In progress") and are documented
stubs here too.

A TDC ("time-distributed conv") layer is a 1-D conv along the frequency
axis applied independently per frame — on TPU that is exactly a 2-D conv
with kernel (k, 1), which XLA tiles straight onto the MXU (no per-frame
reshape round trip like the reference's view/permute dance). The decoder
upsamples with a stride-2 transposed conv; the reference's resample='conv'
decoder path applies a stride-2 *forward* conv (which downsamples — in-
progress code), so this is the working equivalent of its resample='up'
intent.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model
from .cunet import ControlDenseNet
from .film import film, gpocm, pocm
from .modules import choose_nonlinear

EPS = 1e-12


class TDC2d(nn.Module):
    """Dense block of per-frame frequency convs (reference TDC2d:546)."""

    growth_rate: int
    kernel_size: int = 3
    num_layers: int = 2
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        stack = x
        out = x
        pad = self.kernel_size - 1
        for idx in range(self.num_layers):
            y = jnp.pad(stack, ((0, 0), (pad // 2, pad - pad // 2), (0, 0), (0, 0)))
            y = nn.Conv(self.growth_rate, (self.kernel_size, 1), padding="VALID",
                        use_bias=False, name=f"conv{idx}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=self.eps, name=f"norm{idx}")(y)
            if self.nonlinear:
                y = choose_nonlinear(self.nonlinear)(y)
            if idx == self.num_layers - 1:
                out = y
            else:
                stack = jnp.concatenate([stack, y], axis=-1)
        return out


class TDCEncoderBlock2d(nn.Module):
    """TDC2d -> stride-2 down conv -> conditioning (reference :263)."""

    out_channels: int
    kernel_size: int = 3
    num_layers: int = 2
    nonlinear: Optional[str] = "relu"
    conditioning: str = "film"
    down_scale: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x, gamma, beta, train: bool = False):
        y = TDC2d(self.out_channels, self.kernel_size, self.num_layers,
                  self.nonlinear, eps=self.eps, name="tdc2d")(x, train=train)
        s = self.down_scale
        y = nn.Conv(self.out_channels, (s, s), strides=(s, s), padding="VALID",
                    name="downsample2d")(y)
        cond = {"film": film, "pocm": pocm, "gpocm": gpocm}[self.conditioning]
        return cond(y, gamma, beta)


class TDCDecoderBlock2d(nn.Module):
    """[concat skip] -> TDC2d -> stride-2 transposed conv (reference :318)."""

    out_channels: int
    kernel_size: int = 3
    num_layers: int = 2
    nonlinear: Optional[str] = "relu"
    up_scale: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if skip is not None:
            dh, dw = x.shape[1] - skip.shape[1], x.shape[2] - skip.shape[2]
            x = x[:, max(0, dh) // 2 : x.shape[1] - (max(0, dh) - max(0, dh) // 2),
                  max(0, dw) // 2 : x.shape[2] - (max(0, dw) - max(0, dw) // 2)]
            ph, pw = max(0, -dh), max(0, -dw)
            x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
            x = jnp.concatenate([x, skip], axis=-1)
        y = TDC2d(self.out_channels, self.kernel_size, self.num_layers,
                  self.nonlinear, eps=self.eps, name="tdc2d")(x, train=train)
        s = self.up_scale
        return nn.ConvTranspose(self.out_channels, (s, s), strides=(s, s),
                                name="upsample2d")(y)


class PreprocessBlock(nn.Module):
    """pad -> (2,1) conv -> BN -> nonlinear (reference PreprocessBlock:379)."""

    out_channels: int
    kernel_size: Any = (2, 1)
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel_size
        ph, pw = kh - 1, kw - 1
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
        x = nn.Conv(self.out_channels, (kh, kw), padding="VALID", name="conv2d")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="norm2d")(x)
        if self.nonlinear:
            x = choose_nonlinear(self.nonlinear)(x)
        return x


class PostprocessBlock(nn.Module):
    """(2,1) transposed conv -> crop -> BN (reference PostprocessBlock:410)."""

    out_channels: int
    kernel_size: Any = (2, 1)
    nonlinear: Optional[str] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel_size
        x = nn.ConvTranspose(self.out_channels, (kh, kw), padding="VALID",
                             name="deconv2d")(x)
        ch, cw = kh - 1, kw - 1
        x = x[:, ch // 2 : x.shape[1] - (ch - ch // 2) or None,
              cw // 2 : x.shape[2] - (cw - cw // 2) or None]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="norm2d")(x)
        if self.nonlinear:
            x = choose_nonlinear(self.nonlinear)(x)
        return x


@register_model
class TDCUNet2d(nn.Module, SeparationModelMixin):
    """Conditioned TDC U-Net (reference TDCUNet2d:73 + ConditionedUNet2d).

    __call__(input (B, C, H=n_bins, W=n_frames), latent (B, latent_dim))
    -> (B, out_channels, H, W). channels[0] is the input channel count;
    preprocess maps it to channels[1]; each later pair is one encoder block.
    """

    channels: Sequence[int]
    kernel_size: int = 3
    num_layers: int = 2
    control_channels: Sequence[int] = (4, 16, 64)
    enc_nonlinear: Any = "relu"
    dec_nonlinear: Any = "relu"
    out_channels: Optional[int] = None
    conditioning: str = "film"
    masking: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, input, latent, train: bool = False):
        channels = list(self.channels)
        n = len(channels) - 2  # encoder blocks
        enc_nl = self.enc_nonlinear if isinstance(self.enc_nonlinear, (list, tuple)) else [self.enc_nonlinear] * n
        dec_nl = self.dec_nonlinear if isinstance(self.dec_nonlinear, (list, tuple)) else [self.dec_nonlinear] * n

        gamma_shape = "matrix" if self.conditioning in ("pocm", "gpocm") else "vector"
        gammas, betas = ControlDenseNet(
            self.control_channels, channels[2:], gamma_shape=gamma_shape,
            name="control_net",
        )(latent)

        x = jnp.transpose(input, (0, 2, 3, 1))  # channels-last
        H_in, W_in = x.shape[1], x.shape[2]
        x = PreprocessBlock(channels[1], eps=self.eps, name="preprocess")(x, train=train)

        skips = []
        for i in range(n):
            skips.append(x)
            x = TDCEncoderBlock2d(
                channels[i + 2], self.kernel_size, self.num_layers,
                nonlinear=enc_nl[i], conditioning=self.conditioning,
                eps=self.eps, name=f"encoder{i}",
            )(x, gammas[i], betas[i], train=train)

        x = nn.Conv(channels[-1], (1, 1), name="bottleneck")(x)

        dec_channels = channels[:1:-1] + [channels[1]]  # e.g. [20,15,10,5] -> targets
        for i in range(n):
            x = TDCDecoderBlock2d(
                dec_channels[i + 1], self.kernel_size, self.num_layers,
                nonlinear=dec_nl[i], eps=self.eps, name=f"decoder{i}",
            )(x, skip=None if i == 0 else skips[n - i], train=train)

        out_ch = self.out_channels if self.out_channels is not None else channels[0]
        x = PostprocessBlock(out_ch, eps=self.eps, name="postprocess")(x, train=train)

        dh, dw = x.shape[1] - H_in, x.shape[2] - W_in
        ch, cw = max(0, dh), max(0, dw)
        x = x[:, ch // 2 : x.shape[1] - (ch - ch // 2), cw // 2 : x.shape[2] - (cw - cw // 2)]
        ph, pw = max(0, -dh), max(0, -dw)
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
        x = jnp.transpose(x, (0, 3, 1, 2))
        if self.masking:
            x = x * input
        return x
