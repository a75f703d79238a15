"""Meta-TasNet: TasNet whose conv/norm weights are GENERATED from instrument
embeddings.

Capability parity: reference `src/models/meta_tasnet.py` (MetaTasNet:9,
Conv1dGenerated:880, GroupNormGenerated:984, Spectrogram:605): a learned
instrument embedding is pushed through a bottleneck MLP to emit each
layer's conv kernels and norm affines; all sources are processed in
parallel with their own generated weights. Samuel et al., "Meta-learning
Extractors for Music Source Separation" (arXiv:2002.07016).

TPU-first: the reference implements per-source weights as grouped convs
with reshaped kernel tensors; here a `vmap` over the source axis applies
per-source kernels directly -- same math, no grouped-conv gymnastics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model

EPS = 1e-12


class Conv1dGenerated(nn.Module):
    """Per-source conv with kernels generated from embeddings.

    input (B, n_src, T, C_in), embedding (n_src, E) ->
    (B, n_src, T', C_out).
    """

    in_channels: int
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    bottleneck_channels: int = 32

    @nn.compact
    def __call__(self, x, embedding):
        n_src = x.shape[1]
        h = nn.Dense(self.bottleneck_channels, name="bottleneck")(embedding)
        kernel = nn.Dense(
            self.out_channels * self.in_channels * self.kernel_size, name="linear"
        )(h).reshape(n_src, self.kernel_size, self.in_channels, self.out_channels)

        def conv_one(xs, ks):
            return jax.lax.conv_general_dilated(
                xs, ks, window_strides=(self.stride,), padding="VALID",
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )

        y = jax.vmap(conv_one, in_axes=(1, 0), out_axes=1)(x, kernel)
        if self.use_bias:
            bias = nn.Dense(self.out_channels, name="linear_bias")(h)
            y = y + bias[None, :, None, :]
        return y


class GroupNormGenerated(nn.Module):
    """Per-source GroupNorm whose affine params come from embeddings."""

    num_features: int
    groups: int = 1
    bottleneck_channels: int = 32
    eps: float = EPS

    @nn.compact
    def __call__(self, x, embedding):
        h = nn.Dense(self.bottleneck_channels, name="bottleneck")(embedding)
        scale = nn.Dense(self.num_features, name="linear_scale")(h)  # (n_src, C)
        bias = nn.Dense(self.num_features, name="linear_bias")(h)
        B, S, T, C = x.shape
        g = self.groups
        xg = x.reshape(B, S, T, g, C // g)
        mean = jnp.mean(xg, axis=(2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(2, 4), keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + self.eps)
        x = xg.reshape(B, S, T, C)
        return scale[None, :, None, :] * x + bias[None, :, None, :]


class GeneratedResidualBlock(nn.Module):
    """Dilated separable residual unit with generated 1x1s (reference :719)."""

    hidden_channels: int
    num_features: int
    skip_channels: int
    kernel_size: int = 3
    dilation: int = 1
    bottleneck_channels: int = 32
    eps: float = EPS

    @nn.compact
    def __call__(self, x, embedding):
        residual = x
        h = Conv1dGenerated(
            self.num_features, self.hidden_channels, 1,
            bottleneck_channels=self.bottleneck_channels, name="bottleneck_conv",
        )(x, embedding)
        h = nn.relu(h)
        h = GroupNormGenerated(
            self.hidden_channels, bottleneck_channels=self.bottleneck_channels, name="norm1",
        )(h, embedding)
        pad = (self.kernel_size - 1) * self.dilation
        h = jnp.pad(h, ((0, 0), (0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        # Depthwise conv shared across sources (static), pointwise generated.
        B, S, Tp, C = h.shape
        h2 = nn.Conv(
            C, (self.kernel_size,), kernel_dilation=(self.dilation,),
            feature_group_count=C, padding="VALID", name="depthwise",
        )(h.reshape(B * S, Tp, C))
        h = h2.reshape(B, S, -1, C)
        h = nn.relu(h)
        h = GroupNormGenerated(
            self.hidden_channels, bottleneck_channels=self.bottleneck_channels, name="norm2",
        )(h, embedding)
        out = Conv1dGenerated(
            self.hidden_channels, self.num_features, 1,
            bottleneck_channels=self.bottleneck_channels, name="out_conv",
        )(h, embedding)
        skip = Conv1dGenerated(
            self.hidden_channels, self.skip_channels, 1,
            bottleneck_channels=self.bottleneck_channels, name="skip_conv",
        )(h, embedding)
        return out + residual, skip


@register_model
class MetaTasNet(nn.Module, SeparationModelMixin):
    """Single-stage Meta-TasNet. (B, 1, T) -> (B, n_sources, T).

    The reference stacks stages per sample rate (MetaTasNet:9); this module
    is one stage -- stack instances for the multi-rate cascade.
    """

    n_basis: int = 64
    kernel_size: int = 16
    stride: Optional[int] = None
    embed_dim: int = 32
    bottleneck_channels: int = 32
    sep_hidden_channels: int = 64
    sep_bottleneck_channels: int = 32
    sep_skip_channels: int = 32
    sep_kernel_size: int = 3
    sep_num_blocks: int = 2
    sep_num_layers: int = 4
    n_sources: int = 4
    eps: float = EPS

    @nn.compact
    def __call__(self, input):
        stride = self.stride or self.kernel_size // 2
        B, _, T = input.shape
        n_src = self.n_sources

        embedding = self.param(
            "instrument_embedding", nn.initializers.normal(1.0),
            (n_src, self.embed_dim),
        )

        # Shared encoder (all sources see the same latents).
        pad = (stride - (T - self.kernel_size) % stride) % stride
        x = jnp.pad(input, ((0, 0), (0, 0), (pad // 2, pad - pad // 2)))
        xw = jnp.moveaxis(x, 1, 2)  # (B, T, 1)
        from ..ops.filterbank import ConvEncoder, ConvDecoder

        w = ConvEncoder(self.n_basis, self.kernel_size, stride, name="encoder")(xw)
        w = nn.relu(w)  # (B, T', N)

        # Broadcast over sources and run the generated-TCN separator.
        h = jnp.repeat(w[:, None], n_src, axis=1)  # (B, n_src, T', N)
        h = Conv1dGenerated(
            self.n_basis, self.sep_bottleneck_channels, 1,
            bottleneck_channels=self.bottleneck_channels, name="in_conv",
        )(h, embedding)
        skip_sum = 0.0
        for b in range(self.sep_num_blocks):
            for l in range(self.sep_num_layers):
                h, skip = GeneratedResidualBlock(
                    self.sep_hidden_channels, self.sep_bottleneck_channels,
                    self.sep_skip_channels, kernel_size=self.sep_kernel_size,
                    dilation=2**l, bottleneck_channels=self.bottleneck_channels,
                    eps=self.eps, name=f"block{b}_{l}",
                )(h, embedding)
                skip_sum = skip_sum + skip
        m = nn.relu(skip_sum)
        m = Conv1dGenerated(
            self.sep_skip_channels, self.n_basis, 1,
            bottleneck_channels=self.bottleneck_channels, name="mask_conv",
        )(m, embedding)
        mask = nn.sigmoid(m)  # (B, n_src, T', N)

        w_hat = w[:, None] * mask
        y = ConvDecoder(self.n_basis, self.kernel_size, stride, name="decoder")(w_hat)
        y = y[..., 0]
        end = y.shape[-1] - (pad - pad // 2)
        return y[..., pad // 2 : end]
