"""SepFormer: dual-path transformer separator.

Capability parity: reference `src/models/sepformer.py` (SepFormer:16,
Separator:281, SepFormerBlock:401, Intra/InterTransformer:438/480,
LayerNormWrapper:522): encoder -> norm + bottleneck -> segment -> num_blocks
x (intra transformer stack, inter transformer stack) -> overlap-add ->
PReLU -> map -> GTU -> 1x1 -> mask nonlinearity.
Subakan et al., "Attention is All You Need in Speech Separation",
arXiv:2010.13154.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import TransformerEncoderLayer, positional_encoding
from ..ops.filterbank import choose_filterbank
from ..ops.norms import choose_layer_norm
from ..ops.segment import overlap_add, segment
from .base import SeparationModelMixin, register_model
from .modules import PReLU
from .skeleton import LatentMaskingMixin

EPS = 1e-12


class _PathTransformer(nn.Module):
    """Shared intra/inter transformer stack over (B*, L, E) sequences.

    Matches reference Intra/InterTransformer (:438-520): PE is additive with
    the reference's doubling quirk (forward computes x + PE(x) where PE
    already returns x + pe, i.e. 2x + pe) -- reproduced for checkpoint
    parity -- followed by a plain post-norm transformer stack and a final
    gLN over the flattened sequence.
    """

    num_features: int
    num_layers: int = 8
    num_heads: int = 8
    d_ff: int = 1024
    norm: bool = True
    nonlinear: str = "relu"
    dropout: float = 0.0
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, L, E = x.shape
        pe = positional_encoding(L, E)
        h = 2.0 * x + pe[None]
        for idx in range(self.num_layers):
            h = TransformerEncoderLayer(
                E, self.num_heads, d_ff=self.d_ff, nonlinear=self.nonlinear,
                dropout=self.dropout, name=f"layer{idx}",
            )(h, train=train)
        if self.norm:
            h = choose_layer_norm("gLN", E, eps=self.eps)(h)
        return h


class SepFormerBlock(nn.Module):
    num_features: int
    num_layers_intra: int = 8
    num_layers_inter: int = 8
    num_heads_intra: int = 8
    num_heads_inter: int = 8
    d_ff_intra: int = 1024
    d_ff_inter: int = 1024
    norm: bool = True
    nonlinear: str = "relu"
    dropout: float = 0.0
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, S, K, N = x.shape
        # Intra: sequences are chunks -> (B*S, K, N)
        residual = x
        h = x.reshape(B * S, K, N)
        h = _PathTransformer(
            N, self.num_layers_intra, self.num_heads_intra, self.d_ff_intra,
            norm=self.norm, nonlinear=self.nonlinear, dropout=self.dropout,
            eps=self.eps, name="intra_transformer",
        )(h, train=train)
        x = h.reshape(B, S, K, N) + residual
        # Inter: sequences run across chunks -> (B*K, S, N)
        residual = x
        h = jnp.swapaxes(x, 1, 2).reshape(B * K, S, N)
        h = _PathTransformer(
            N, self.num_layers_inter, self.num_heads_inter, self.d_ff_inter,
            norm=self.norm, nonlinear=self.nonlinear, dropout=self.dropout,
            eps=self.eps, name="inter_transformer",
        )(h, train=train)
        x = jnp.swapaxes(h.reshape(B, K, S, N), 1, 2) + residual
        return x


class Separator(nn.Module):
    """(B, T', N) -> (B, n_src, T', N) (reference Separator:281-363)."""

    num_features: int
    bottleneck_channels: int = 256
    chunk_size: int = 250
    hop_size: int = 125
    num_blocks: int = 2
    num_layers_intra: int = 8
    num_layers_inter: int = 8
    num_heads_intra: int = 8
    num_heads_inter: int = 8
    d_ff_intra: int = 1024
    d_ff_inter: int = 1024
    norm: bool = True
    nonlinear: str = "relu"
    dropout: float = 0.0
    mask_nonlinear: str = "relu"
    causal: bool = False
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, N = x.shape
        K, P = self.chunk_size, self.hop_size

        norm_name = "cLN" if self.causal else "gLN"
        h = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps)(x)
        h = nn.Dense(self.bottleneck_channels, name="bottleneck_conv1d_in")(h)

        padding = (P - (T - K) % P) % P
        pl, pr = padding // 2, padding - padding // 2
        h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))
        h = segment(h, K, P)
        for idx in range(self.num_blocks):
            h = SepFormerBlock(
                self.bottleneck_channels,
                num_layers_intra=self.num_layers_intra,
                num_layers_inter=self.num_layers_inter,
                num_heads_intra=self.num_heads_intra,
                num_heads_inter=self.num_heads_inter,
                d_ff_intra=self.d_ff_intra,
                d_ff_inter=self.d_ff_inter,
                norm=self.norm,
                nonlinear=self.nonlinear,
                dropout=self.dropout,
                causal=self.causal,
                eps=self.eps,
                name=f"block{idx}",
            )(h, train=train)
        h = overlap_add(h, P)
        h = h[:, pl : h.shape[1] - pr]

        h = PReLU(name="prelu")(h)
        h = nn.Dense(self.n_sources * self.num_features, name="map")(h)
        h = h.reshape(B, T, self.n_sources, self.num_features)
        h = jnp.moveaxis(h, 2, 1)  # (B, n_src, T, N)
        # GTU head (reference GTU1d): tanh(conv) * sigmoid(conv), then 1x1.
        a = nn.Dense(self.num_features, name="gtu_tanh")(h)
        b = nn.Dense(self.num_features, name="gtu_sigmoid")(h)
        h = jnp.tanh(a) * nn.sigmoid(b)
        h = nn.Dense(self.num_features, name="bottleneck_conv1d_out")(h)
        if self.mask_nonlinear == "relu":
            return nn.relu(h)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(h)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(h, axis=1)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")


@register_model
class SepFormer(nn.Module, LatentMaskingMixin, SeparationModelMixin):
    """Public API matches the reference: (B, 1, T) -> (B, n_sources, T)."""

    n_basis: int
    kernel_size: int
    stride: Optional[int] = None
    enc_basis: str = "trainable"
    dec_basis: str = "trainable"
    enc_nonlinear: Optional[str] = "relu"
    window_fn: str = "hann"
    enc_onesided: bool = True
    enc_return_complex: bool = True
    sep_bottleneck_channels: int = 256
    sep_chunk_size: int = 250
    sep_hop_size: int = 125
    sep_num_blocks: int = 2
    sep_num_layers_intra: int = 8
    sep_num_layers_inter: int = 8
    sep_num_heads_intra: int = 8
    sep_num_heads_inter: int = 8
    sep_d_ff_intra: int = 1024
    sep_d_ff_inter: int = 1024
    sep_norm: bool = True
    sep_nonlinear: str = "relu"
    sep_dropout: float = 0.0
    mask_nonlinear: str = "relu"
    causal: bool = False
    n_sources: int = 2
    eps: float = EPS
    in_channels: int = 1

    def setup(self):
        stride = self.stride or self.kernel_size // 2
        self._stride = stride
        encoder, decoder = choose_filterbank(
            self.n_basis, kernel_size=self.kernel_size, stride=stride,
            enc_basis=self.enc_basis, dec_basis=self.dec_basis,
            enc_nonlinear=self.enc_nonlinear, window_fn=self.window_fn,
            enc_onesided=self.enc_onesided, enc_return_complex=self.enc_return_complex,
            in_channels=self.in_channels,
        )
        self.encoder = encoder
        self.decoder = decoder
        self.separator = Separator(
            num_features=self.n_basis,
            bottleneck_channels=self.sep_bottleneck_channels,
            chunk_size=self.sep_chunk_size,
            hop_size=self.sep_hop_size,
            num_blocks=self.sep_num_blocks,
            num_layers_intra=self.sep_num_layers_intra,
            num_layers_inter=self.sep_num_layers_inter,
            num_heads_intra=self.sep_num_heads_intra,
            num_heads_inter=self.sep_num_heads_inter,
            d_ff_intra=self.sep_d_ff_intra,
            d_ff_inter=self.sep_d_ff_inter,
            norm=self.sep_norm,
            nonlinear=self.sep_nonlinear,
            dropout=self.sep_dropout,
            mask_nonlinear=self.mask_nonlinear,
            causal=self.causal,
            n_sources=self.n_sources,
            eps=self.eps,
        )
