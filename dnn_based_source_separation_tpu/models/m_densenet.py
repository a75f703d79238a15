"""Multi-scale DenseNet (MDenseNet) core blocks and model.

Capability parity: reference `src/models/m_densenet.py` (MDenseNet:67,
MDenseNetBackbone:341, Encoder:429, Decoder:507, Down/UpSampleDenseBlock:
585/630, DenseBlock:662, ConvBlock2d:765). Takahashi & Mitsufuji,
"Multi-scale Multi-band DenseNets for Audio Source Separation".

TPU-first: NHWC layout (B, n_bins, n_frames, C) so convs feed the MXU with
channels on the lane dim; the dense block's split-accumulate structure is
kept exactly (each conv emits sum(growth_rate[i:]) channels and the running
residual is split per step).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model
from .modules import choose_nonlinear

EPS = 1e-12


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _expand(v, depth, kinds):
    # flax stores list attributes as tuples; accept both. A 2-tuple that is
    # NOT per-layer config (e.g. kernel_size pairs) never reaches here.
    if isinstance(v, (list, tuple)):
        assert len(v) == depth, f"length mismatch: {v} vs depth {depth}"
        return list(v)
    assert isinstance(v, kinds) or v is None
    return [v] * depth


class ConvBlock2d(nn.Module):
    """BN -> nonlinear -> same-pad -> conv (reference ConvBlock2d:765)."""

    out_channels: int
    kernel_size: Any = (3, 3)
    dilation: Any = 1
    norm: Any = True
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        dh, dw = _pair(self.dilation)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm2d")(x)
        if self.nonlinear:
            x = choose_nonlinear(self.nonlinear)(x)
        ph, pw = (kh - 1) * dh, (kw - 1) * dw
        pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
        x = nn.Conv(
            self.out_channels, (kh, kw), kernel_dilation=(dh, dw),
            padding=pads, name="conv2d",
        )(x)
        return x


class DenseBlock(nn.Module):
    """Split-accumulate dense block (reference DenseBlock:662)."""

    growth_rate: Any  # int (with depth) or list
    kernel_size: Any = (3, 3)
    depth: Optional[int] = None
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth_rate = self.growth_rate
        if isinstance(growth_rate, int):
            assert self.depth is not None
            growth_rate = [growth_rate] * self.depth
        depth = len(growth_rate)
        dilated = _expand(self.dilated, depth, bool)
        norm = _expand(self.norm, depth, (bool, str))
        nonlinear = _expand(self.nonlinear, depth, (bool, str))

        x_residual = 0.0
        for idx in range(depth):
            if idx > 0:
                c = growth_rate[idx - 1]
                x, x_residual = x_residual[..., :c], x_residual[..., c:]
            out_ch = sum(growth_rate[idx:])
            dilation = 2**idx if dilated[idx] else 1
            x = ConvBlock2d(
                out_ch, kernel_size=self.kernel_size, dilation=dilation,
                norm=norm[idx], nonlinear=nonlinear[idx], eps=self.eps,
                name=f"conv_block{idx}",
            )(x, train=train)
            x_residual = x_residual + x
        return x_residual


class DownSampleDenseBlock(nn.Module):
    """DenseBlock then avg-pool downsample; skip is the unpooled output."""

    growth_rate: Any
    kernel_size: Any = (3, 3)
    down_scale: Any = (2, 2)
    depth: Optional[int] = None
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        sh, sw = _pair(self.down_scale)
        H, W = x.shape[1], x.shape[2]
        ph, pw = (sh - H % sh) % sh, (sw - W % sw) % sw
        pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        x = jnp.pad(x, pads)
        x = DenseBlock(
            self.growth_rate, self.kernel_size, depth=self.depth,
            dilated=self.dilated, norm=self.norm, nonlinear=self.nonlinear,
            eps=self.eps, name="dense_block",
        )(x, train=train)
        skip = x[:, pads[1][0] : x.shape[1] - pads[1][1], pads[2][0] : x.shape[2] - pads[2][1]]
        out = nn.avg_pool(x, (sh, sw), strides=(sh, sw))
        return out, skip


class UpSampleDenseBlock(nn.Module):
    """BN -> transpose-conv upsample -> crop -> concat skip -> DenseBlock."""

    growth_rate: Any
    kernel_size: Any = (3, 3)
    up_scale: Any = (2, 2)
    depth: Optional[int] = None
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        sh, sw = _pair(self.up_scale)
        C = x.shape[-1]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm2d")(x)
        x = nn.ConvTranspose(C, (sh, sw), strides=(sh, sw), name="upsample2d")(x)
        # Crop to skip's spatial size (upsample may overshoot the padding).
        dh, dw = x.shape[1] - skip.shape[1], x.shape[2] - skip.shape[2]
        x = x[:, dh // 2 : x.shape[1] - (dh - dh // 2), dw // 2 : x.shape[2] - (dw - dw // 2)]
        x = jnp.concatenate([x, skip], axis=-1)
        return DenseBlock(
            self.growth_rate, self.kernel_size, depth=self.depth,
            dilated=self.dilated, norm=self.norm, nonlinear=self.nonlinear,
            eps=self.eps, name="dense_block",
        )(x, train=train)


class MDenseNetBackbone(nn.Module):
    """Initial conv -> encoder -> bottleneck dense -> decoder (+1x1 head)."""

    num_features: int
    growth_rate: Sequence[int]
    kernel_size: Any = (3, 3)
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth_rate = list(self.growth_rate)
        assert len(growth_rate) % 2 == 1, "`len(growth_rate)` must be odd."
        n_enc = len(growth_rate) // 2
        depth = _expand(self.depth, len(growth_rate), int)
        dilated = _expand(self.dilated, len(growth_rate), bool)
        norm = _expand(self.norm, len(growth_rate), (bool, str))
        nonlinear = _expand(self.nonlinear, len(growth_rate), (bool, str))

        kh, kw = _pair(self.kernel_size)
        pads = ((0, 0), ((kh - 1) // 2, (kh - 1) - (kh - 1) // 2),
                ((kw - 1) // 2, (kw - 1) - (kw - 1) // 2), (0, 0))
        x = jnp.pad(x, pads)
        x = nn.Conv(self.num_features, (kh, kw), padding="VALID", name="conv2d")(x)

        skips: List = []
        for idx in range(n_enc):
            x, skip = DownSampleDenseBlock(
                growth_rate[idx], self.kernel_size, down_scale=self.scale,
                depth=depth[idx], dilated=dilated[idx], norm=norm[idx],
                nonlinear=nonlinear[idx], eps=self.eps, name=f"encoder{idx}",
            )(x, train=train)
            skips.append(skip)

        x = DenseBlock(
            growth_rate[n_enc], self.kernel_size, depth=depth[n_enc],
            dilated=dilated[n_enc], norm=norm[n_enc], nonlinear=nonlinear[n_enc],
            eps=self.eps, name="bottleneck",
        )(x, train=train)

        for j, idx in enumerate(range(n_enc + 1, len(growth_rate))):
            x = UpSampleDenseBlock(
                growth_rate[idx], self.kernel_size, up_scale=self.scale,
                depth=depth[idx], dilated=dilated[idx], norm=norm[idx],
                nonlinear=nonlinear[idx], eps=self.eps, name=f"decoder{j}",
            )(x, skips[n_enc - 1 - j], train=train)

        if self.out_channels is not None:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="pointwise_norm")(x)
            x = nn.Conv(self.out_channels, (1, 1), name="pointwise_conv2d")(x)
        return x


class GLU2d(nn.Module):
    """conv(a) * sigmoid(conv(b)) 1x1 head (reference src/modules/glu.py)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        a = nn.Conv(self.out_channels, (1, 1), name="map")(x)
        b = nn.Conv(self.out_channels, (1, 1), name="gate")(x)
        return a * nn.sigmoid(b)


@register_model
class MDenseNet(nn.Module, SeparationModelMixin):
    """Single-band multi-scale DenseNet (reference MDenseNet:67).

    I/O matches the reference: (B, in_channels, n_bins, n_frames) amplitude
    -> same shape.
    """

    in_channels: int
    num_features: int
    growth_rate: Sequence[int]
    kernel_size: Any = (3, 3)
    max_bin: int = 1367
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    kernel_size_final: Any = None
    dilated_final: Any = False
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    depth_final: Any = None
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        B, C, n_bins, n_frames = input.shape
        max_bin = self.max_bin

        if max_bin == n_bins:
            x_valid, x_invalid = input, None
        else:
            x_valid, x_invalid = input[:, :, :max_bin], input[:, :, max_bin:]

        scale_in = self.param("scale_in", nn.initializers.ones, (max_bin,))
        bias_in = self.param("bias_in", nn.initializers.zeros, (max_bin,))
        scale_out = self.param("scale_out", nn.initializers.ones, (max_bin,))
        bias_out = self.param("bias_out", nn.initializers.zeros, (max_bin,))

        x = (x_valid - bias_in[:, None]) / (jnp.abs(scale_in[:, None]) + self.eps)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

        x = MDenseNetBackbone(
            self.num_features, self.growth_rate, self.kernel_size,
            scale=self.scale, dilated=self.dilated, norm=self.norm,
            nonlinear=self.nonlinear, depth=self.depth, eps=self.eps, name="net",
        )(x, train=train)
        x = DenseBlock(
            self.growth_rate_final, self.kernel_size_final or self.kernel_size,
            depth=self.depth_final, dilated=self.dilated_final,
            norm=self.norm_final, nonlinear=self.nonlinear_final,
            eps=self.eps, name="dense_block",
        )(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm2d")(x)
        x = GLU2d(C, name="glu2d")(x)
        x = jnp.transpose(x, (0, 3, 1, 2))  # back to (B, C, F', T')

        x = scale_out[:, None] * x + bias_out[:, None]
        x = nn.relu(x)

        # Crop spatial overshoot back to the input grid.
        dh = x.shape[2] - max_bin
        dw = x.shape[3] - n_frames
        x = x[:, :, dh // 2 : x.shape[2] - (dh - dh // 2), dw // 2 : x.shape[3] - (dw - dw // 2)]

        if x_invalid is None:
            return x
        return jnp.concatenate([x, x_invalid], axis=2)
