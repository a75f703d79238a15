"""Plain (image-style) DenseNet.

Capability parity: reference `src/models/densenet.py` (DenseNet:11,
DenseBlock:45, DenseLayer:66, Transition2d:102) — the classic DenseNet-BC
building blocks (BN -> ReLU -> 1x1 bottleneck -> BN -> ReLU -> KxK conv,
dense concatenation, averaged-pool transitions), kept in the zoo as the
backbone playground the reference ships alongside the MDenseNet family.

TPU-first: NHWC layout internally so the 1x1 bottleneck and KxK convs run
as MXU matmuls with channels on the lane dimension; the reference's NCHW
(B, C, H, W) I/O contract is preserved at the boundary. The reference's
padding rule (`F.pad` such that the conv output keeps the input's spatial
size for ANY stride, densenet.py:84-89) is reproduced exactly.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model

EPS = 1e-12


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class DenseNetLayer(nn.Module):
    """BN -> ReLU -> 1x1 bottleneck -> BN -> ReLU -> pad -> KxK conv, then
    concat with the input (reference DenseLayer:66)."""

    growth_rate: int
    kernel_size: Any
    stride: Any = (1, 1)
    hidden_channels: int = 128
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        H, W = x.shape[1], x.shape[2]
        # Reference padding rule (densenet.py:84-89): output spatial size
        # equals the INPUT size regardless of stride.
        ph = H * (sh - 1) + kh - sh
        pw = W * (sw - 1) + kw - sw
        pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="norm2d1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.hidden_channels, (1, 1), use_bias=False,
                    name="bottleneck_conv2d")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="norm2d2")(h)
        h = nn.relu(h)
        h = jnp.pad(h, pads)
        h = nn.Conv(self.growth_rate, (kh, kw), strides=(sh, sw),
                    padding="VALID", use_bias=False, name="conv2d")(h)
        return jnp.concatenate([x, h], axis=-1)


class Transition2d(nn.Module):
    """BN -> ReLU -> 1x1 conv -> 2x2 avg-pool (reference Transition2d:102)."""

    out_channels: int
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="norm2d")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv2d")(x)
        # torch AvgPool2d floor semantics == VALID pooling.
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetBlock(nn.Module):
    """num_layers dense layers then a transition (reference DenseBlock:45)."""

    out_channels: int
    growth_rate: int
    kernel_size: Any
    stride: Any = (1, 1)
    hidden_channels: int = 128
    num_layers: int = 3
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        for idx in range(self.num_layers):
            x = DenseNetLayer(
                self.growth_rate, self.kernel_size, stride=self.stride,
                hidden_channels=self.hidden_channels, eps=self.eps,
                name=f"layer{idx}",
            )(x, train=train)
        return Transition2d(self.out_channels, eps=self.eps,
                            name="transition2d")(x, train=train)


@register_model
class DenseNet(nn.Module, SeparationModelMixin):
    """Plain DenseNet (reference DenseNet:11).

    I/O contract matches the reference: (B, in_channels, H, W) ->
    (B, C_out, H/2^num_blocks, W/2^num_blocks) with
    C_out = the final block's transition width.
    """

    in_channels: int
    num_features: int
    growth_rate: int
    kernel_size: Any
    stride: Any = (1, 1)
    hidden_channels: int = 128
    num_blocks: int = 3
    num_layers: Union[int, Sequence[int]] = (2, 3, 4)
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        num_layers = self.num_layers
        if isinstance(num_layers, (list, tuple)):
            assert self.num_blocks == len(num_layers), (
                "`num_blocks` must be equal to `len(num_layers)`")
            num_layers = list(num_layers)
        else:
            num_layers = [num_layers] * self.num_blocks

        x = jnp.transpose(input, (0, 2, 3, 1))  # NCHW -> NHWC
        x = nn.Conv(self.num_features, (1, 1), name="preprocess")(x)

        num_features = self.num_features
        for idx, n_layers in enumerate(num_layers):
            out_channels = (num_features + n_layers * self.growth_rate) // 2
            x = DenseNetBlock(
                out_channels, self.growth_rate, self.kernel_size,
                stride=self.stride, hidden_channels=self.hidden_channels,
                num_layers=n_layers, eps=self.eps, name=f"block{idx}",
            )(x, train=train)
            num_features = out_channels

        return jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
