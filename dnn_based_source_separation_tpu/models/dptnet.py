"""DPTNet: dual-path transformer with LSTM-based feed-forward (improved
transformer).

Capability parity: reference `src/models/dptnet.py` (DPTNet:15,
Separator:271, ImprovedTransformer:463, MultiheadAttentionBlock:482,
FeedForwardBlock:527 -- note the LSTM inside the FFN at :541) and the
standalone backbone `src/models/dptransformer.py`.
Chen et al., "Dual-Path Transformer Network", arXiv:2007.13975.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import MultiheadAttention
from ..ops.filterbank import choose_filterbank
from ..ops.norms import choose_layer_norm
from ..ops.rnn import choose_rnn
from ..ops.segment import overlap_add, segment
from .base import SeparationModelMixin, register_model
from .modules import PReLU, choose_nonlinear
from .skeleton import LatentMaskingMixin

EPS = 1e-12


class ImprovedTransformer(nn.Module):
    """MHA block + LSTM feed-forward block, both with residual + gLN/cLN.

    Operates on (B', L, E) sequences (reference ImprovedTransformer:463).
    """

    num_features: int
    hidden_channels: int
    num_heads: int = 4
    norm: bool = True
    nonlinear: str = "relu"
    dropout: float = 0.0
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Multi-head attention block (reference :482-527).
        residual = x
        h = MultiheadAttention(
            self.num_features, self.num_heads, dropout=self.dropout,
            name="multihead_attn",
        )(x, train=train)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = h + residual
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            h = choose_layer_norm(norm_name, self.num_features, causal=self.causal, eps=self.eps)(h)
        # LSTM feed-forward block (reference :527-575).
        residual = h
        f = choose_rnn("lstm", self.hidden_channels, bidirectional=not self.causal, parent_name="rnn")(h)
        f = choose_nonlinear(self.nonlinear)(f)
        if self.dropout > 0.0:
            f = nn.Dropout(rate=self.dropout, deterministic=not train)(f)
        f = nn.Dense(self.num_features, name="fc")(f)
        h = f + residual
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            h = choose_layer_norm(norm_name, self.num_features, causal=self.causal, eps=self.eps)(h)
        return h


class DualPathTransformerBlock(nn.Module):
    num_features: int
    hidden_channels: int
    num_heads: int = 4
    norm: bool = True
    nonlinear: str = "relu"
    dropout: float = 0.0
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, S, K, N = x.shape
        h = x.reshape(B * S, K, N)
        h = ImprovedTransformer(
            N, self.hidden_channels, num_heads=self.num_heads, norm=self.norm,
            nonlinear=self.nonlinear, dropout=self.dropout, causal=False,
            eps=self.eps, name="intra_chunk_block",
        )(h, train=train)
        x = h.reshape(B, S, K, N)
        h = jnp.swapaxes(x, 1, 2).reshape(B * K, S, N)
        h = ImprovedTransformer(
            N, self.hidden_channels, num_heads=self.num_heads, norm=self.norm,
            nonlinear=self.nonlinear, dropout=self.dropout, causal=self.causal,
            eps=self.eps, name="inter_chunk_block",
        )(h, train=train)
        return jnp.swapaxes(h.reshape(B, K, S, N), 1, 2)


class Separator(nn.Module):
    """(B, T', N) -> (B, n_src, T', N) (reference Separator:271-350)."""

    num_features: int
    bottleneck_channels: int = 64
    hidden_channels: int = 256
    chunk_size: int = 100
    hop_size: Optional[int] = None
    num_blocks: int = 6
    num_heads: int = 4
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
        K = self.chunk_size
        P = self.hop_size or K // 2

        h = nn.Dense(self.bottleneck_channels, name="bottleneck_conv1d")(x)
        padding = (P - (T - K) % P) % P
        pl, pr = padding // 2, padding - padding // 2
        h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))
        h = segment(h, K, P)  # (B, S, K, C)
        # norm2d over the full (S*K, C) extent per sample (reference :337).
        Bc, S, Kc, C = h.shape
        norm_name = "cLN" if self.causal else "gLN"
        h = h.reshape(Bc, S * Kc, C)
        h = choose_layer_norm(norm_name, C, causal=self.causal, eps=self.eps)(h)
        h = h.reshape(Bc, S, Kc, C)
        for idx in range(self.num_blocks):
            h = DualPathTransformerBlock(
                self.bottleneck_channels, self.hidden_channels,
                num_heads=self.num_heads, norm=self.norm,
                nonlinear=self.nonlinear, dropout=self.dropout,
                causal=self.causal, eps=self.eps,
                name=f"block{idx}",
            )(h, train=train)
        h = overlap_add(h, P)
        h = h[:, pl : h.shape[1] - pr]
        h = PReLU(name="prelu")(h)
        h = nn.Dense(self.n_sources * self.num_features, name="map")(h)
        h = h.reshape(B, T, self.n_sources, self.num_features)
        h = jnp.moveaxis(h, 2, 1)
        a = nn.Dense(self.num_features, name="gtu_tanh")(h)
        b = nn.Dense(self.num_features, name="gtu_sigmoid")(h)
        h = jnp.tanh(a) * nn.sigmoid(b)
        if self.mask_nonlinear == "relu":
            return nn.relu(h)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(h)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(h, axis=1)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")


@register_model
class DPTNet(nn.Module, LatentMaskingMixin, SeparationModelMixin):
    """Public API matches the reference: (B, 1, T) -> (B, n_sources, T)."""

    n_basis: int
    kernel_size: int
    stride: Optional[int] = None
    enc_basis: str = "trainable"
    dec_basis: str = "trainable"
    enc_nonlinear: Optional[str] = None
    window_fn: str = "hann"
    enc_onesided: bool = True
    enc_return_complex: bool = True
    sep_bottleneck_channels: int = 64
    sep_hidden_channels: int = 256
    sep_chunk_size: int = 100
    sep_hop_size: Optional[int] = None
    sep_num_blocks: int = 6
    sep_num_heads: int = 4
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
            hidden_channels=self.sep_hidden_channels,
            chunk_size=self.sep_chunk_size,
            hop_size=self.sep_hop_size,
            num_blocks=self.sep_num_blocks,
            num_heads=self.sep_num_heads,
            norm=self.sep_norm,
            nonlinear=self.sep_nonlinear,
            dropout=self.sep_dropout,
            mask_nonlinear=self.mask_nonlinear,
            causal=self.causal,
            n_sources=self.n_sources,
            eps=self.eps,
        )
