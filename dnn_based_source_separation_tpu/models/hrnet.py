"""HRNet: high-resolution parallel multi-scale CNN for vocal separation.

Capability parity: reference `src/models/hrnet.py` (HRNet:11,
HRNetBackbone:147, StackedParallelResidualBlock2d:182, MixBlock2d:244,
ConcatMixBlock2d:308, Down/UpsampleBlock2d:353/382): parallel multi-scale
streams of bottleneck residual blocks, all-to-all fusion after each stage
(strided-conv downsampling, bilinear upsampling), and a concat head whose
ReLU output masks the input spectrogram. Wang et al., arXiv:1908.07919.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model
from .modules import choose_nonlinear
from .resnet import ResidualBlock2d

EPS = 1e-12


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class DownsampleBlock2d(nn.Module):
    out_channels: int
    scale: Any = (2, 2)
    nonlinear: str = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        sh, sw = _pair(self.scale)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="pointwise_conv2d")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm2d")(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = nn.Conv(self.out_channels, (3, 3), strides=(sh, sw), padding="VALID", name="conv2d")(h)
        return choose_nonlinear(self.nonlinear)(h)


class UpsampleBlock2d(nn.Module):
    out_channels: int
    scale: Any = (2, 2)  # upsampling factor
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        sh, sw = _pair(self.scale)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="pointwise_conv2d")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=self.eps, name="norm2d")(h)
        B, H, W, C = h.shape
        return jax.image.resize(h, (B, H * sh, W * sw, C), method="bilinear")


def _crop_to(x, H, W):
    dh, dw = x.shape[1] - H, x.shape[2] - W
    return x[:, dh // 2 : x.shape[1] - (dh - dh // 2), dw // 2 : x.shape[2] - (dw - dw // 2)]


class MixBlock2d(nn.Module):
    """All-to-all multi-scale fusion (reference MixBlock2d:244)."""

    in_channels: Sequence[int]
    additional_channels: int = 0
    scale: Any = (2, 2)
    eps: float = EPS

    @nn.compact
    def __call__(self, xs, train: bool = False):
        sh, sw = _pair(self.scale)
        max_in = len(xs) - 1
        out_channels = list(self.in_channels) + ([self.additional_channels] if self.additional_channels > 0 else [])
        outs = []
        for idx_out, c_out in enumerate(out_channels):
            acc = None
            for idx_in in range(max_in + 1):
                x = xs[idx_in]
                d = idx_out - idx_in
                if d > 0:
                    y = DownsampleBlock2d(c_out, scale=(sh**d, sw**d), eps=self.eps,
                                          name=f"down_{idx_out}_{idx_in}")(x, train=train)
                elif d < 0:
                    y = UpsampleBlock2d(c_out, scale=(sh**(-d), sw**(-d)), eps=self.eps,
                                        name=f"up_{idx_out}_{idx_in}")(x, train=train)
                else:
                    y = x
                if acc is None:
                    acc = y
                else:
                    y = _crop_to(y, acc.shape[1], acc.shape[2])
                    acc = acc + y
            outs.append(acc)
        return outs


class StackedResidualBlock2d(nn.Module):
    out_channels: int
    bottleneck_channels: int
    kernel_size: Any = (3, 3)
    nonlinear: str = "relu"
    num_stacks: int = 1
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        for idx in range(self.num_stacks):
            x = ResidualBlock2d(
                self.out_channels, self.bottleneck_channels,
                kernel_size=self.kernel_size, nonlinear=self.nonlinear,
                eps=self.eps, name=f"block{idx}",
            )(x, train=train)
        return x


@register_model
class HRNet(nn.Module, SeparationModelMixin):
    """(B, in_channels, n_bins, n_frames) amplitude -> masked amplitude."""

    in_channels: int
    hidden_channels: Sequence[int] = (16, 32, 64)
    bottleneck_channels: int = 8
    kernel_size: Any = (3, 3)
    scale: Any = (2, 2)
    nonlinear: str = "relu"
    mask_nonlinear: str = "relu"
    num_stacks: Any = 1
    in_num_stacks: int = 2
    out_num_stacks: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        hidden = list(self.hidden_channels)
        num_stages = len(hidden)
        num_stacks = self.num_stacks
        if isinstance(num_stacks, int):
            num_stacks = [num_stacks] * num_stages

        x = jnp.transpose(input, (0, 2, 3, 1))  # NHWC
        H_in, W_in = x.shape[1], x.shape[2]

        x = StackedResidualBlock2d(
            hidden[0], self.bottleneck_channels, self.kernel_size,
            self.nonlinear, self.in_num_stacks, eps=self.eps, name="conv2d_in",
        )(x, train=train)

        xs = [x]
        for stage in range(num_stages):
            # Per-level residual stacks.
            for stack in range(num_stacks[stage]):
                xs = [
                    ResidualBlock2d(
                        xs[level].shape[-1], self.bottleneck_channels,
                        kernel_size=self.kernel_size, nonlinear=self.nonlinear,
                        eps=self.eps, name=f"stage{stage}_stack{stack}_level{level}",
                    )(xs[level], train=train)
                    for level in range(len(xs))
                ]
            additional = hidden[stage + 1] if stage < num_stages - 1 else 0
            xs = MixBlock2d(
                [hidden[i] for i in range(len(xs))], additional,
                scale=self.scale, eps=self.eps, name=f"mix{stage}",
            )(xs, train=train)

        # Concat head: upsample every level to full resolution.
        base_H, base_W = xs[0].shape[1], xs[0].shape[2]
        ups = [xs[0]]
        sh, sw = _pair(self.scale)
        for level in range(1, len(xs)):
            y = UpsampleBlock2d(
                hidden[level], scale=(sh**level, sw**level), eps=self.eps,
                name=f"concat_up{level}",
            )(xs[level], train=train)
            ups.append(_crop_to(y, base_H, base_W))
        h = jnp.concatenate(ups, axis=-1)

        h = StackedResidualBlock2d(
            self.in_channels, self.bottleneck_channels, self.kernel_size,
            self.nonlinear, self.out_num_stacks, eps=self.eps, name="conv2d_out",
        )(h, train=train)
        mask = choose_nonlinear(self.mask_nonlinear)(h)
        mask = _crop_to(mask, H_in, W_in)
        mask = jnp.transpose(mask, (0, 3, 1, 2))
        return mask * input
