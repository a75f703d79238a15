"""GALR / GALRNet: globally attentive, locally recurrent dual-path network.

Capability parity: reference `src/models/galr.py` (GALR:9, GALRBlock:32,
GloballyAttentiveBlock:80, LowDimensionGloballyAttentiveBlock:135,
LayerNormAlongChannel:204) and `src/models/galrnet.py` (GALRNet:13,
Separator:166). Lam et al., arXiv:2101.05014.

Notes kept for parity: GALR's positional encoding CONCATENATES [sin, cos]
(unlike transformer.py's interleaving); the low-dimension variant projects
the chunk axis K -> Q with fc before global attention and back after.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.attention import MultiheadAttention
from ..ops.filterbank import choose_filterbank
from ..ops.norms import choose_layer_norm
from ..ops.segment import overlap_add, segment
from .base import SeparationModelMixin, register_model
from .dprnn import IntraChunkRNN as LocallyRecurrentBlock
from .modules import PReLU
from .skeleton import LatentMaskingMixin

EPS = 1e-12


def _galr_positional_encoding(length: int, dimension: int, base: float = 10000.0):
    """(length, dimension) = concat[sin | cos] (reference galr.py:63-78)."""
    position = np.arange(length, dtype=np.float32)[:, None]
    index = (np.arange(dimension // 2, dtype=np.float32) / dimension)[None, :]
    indices = position / base**index
    return jnp.asarray(np.concatenate([np.sin(indices), np.cos(indices)], axis=1))


class GloballyAttentiveBlock(nn.Module):
    """Inter-chunk global MHA with PE, optional K->Q down-projection.

    Input/output (B, S, K, N). down_chunk_size=None disables low-dimension.
    """

    num_features: int
    chunk_size: Optional[int] = None
    down_chunk_size: Optional[int] = None
    num_heads: int = 8
    causal: bool = False
    norm: bool = True
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, S, K, N = x.shape
        low_dim = self.down_chunk_size is not None
        h = x
        if low_dim:
            # fc over the chunk axis: (B, S, K, N) -> treat K as features.
            h = jnp.swapaxes(h, 2, 3)  # (B, S, N, K)
            h = nn.Dense(self.down_chunk_size, name="fc_map")(h)
            h = jnp.swapaxes(h, 2, 3)  # (B, S, Q, N)
        Q = h.shape[2]
        if self.norm:
            h = nn.LayerNorm(epsilon=self.eps, name="norm_in")(h)  # along channel
        pe = _galr_positional_encoding(S * Q, N).reshape(S, Q, N)
        h = h + pe[None]
        # Attention across chunks: sequences of length S, batch B*Q.
        h = jnp.swapaxes(h, 1, 2).reshape(B * Q, S, N)
        residual = h
        h = MultiheadAttention(N, self.num_heads, name="multihead_attn")(h)
        h = h + residual
        h = h.reshape(B, Q, S, N)
        h = jnp.swapaxes(h, 1, 2)  # (B, S, Q, N)
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            h = h.reshape(B, S * Q, N)
            h = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps, )(h)
            h = h.reshape(B, S, Q, N)
        if low_dim:
            h = jnp.swapaxes(h, 2, 3)  # (B, S, N, Q)
            h = nn.Dense(K, name="fc_inv")(h)
            h = jnp.swapaxes(h, 2, 3)  # (B, S, K, N)
        return h + x


class GALRBlock(nn.Module):
    num_features: int
    hidden_channels: int
    num_heads: int = 8
    norm: bool = True
    low_dimension: bool = True
    chunk_size: Optional[int] = None
    down_chunk_size: Optional[int] = None
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        x = LocallyRecurrentBlock(
            self.num_features, self.hidden_channels, norm=self.norm,
            eps=self.eps, name="intra_chunk_block",
        )(x)
        x = GloballyAttentiveBlock(
            self.num_features,
            chunk_size=self.chunk_size,
            down_chunk_size=self.down_chunk_size if self.low_dimension else None,
            num_heads=self.num_heads, causal=self.causal, norm=self.norm,
            eps=self.eps, name="inter_chunk_block",
        )(x)
        return x


class GALR(nn.Module):
    """(B, S, K, N) -> (B, S, K, N) stack of GALR blocks (reference GALR:9)."""

    num_features: int
    hidden_channels: int
    num_blocks: int = 6
    num_heads: int = 8
    norm: bool = True
    low_dimension: bool = True
    chunk_size: Optional[int] = None
    down_chunk_size: Optional[int] = None
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        for idx in range(self.num_blocks):
            x = GALRBlock(
                self.num_features, self.hidden_channels, num_heads=self.num_heads,
                norm=self.norm, low_dimension=self.low_dimension,
                chunk_size=self.chunk_size, down_chunk_size=self.down_chunk_size,
                causal=self.causal, eps=self.eps, name=f"block{idx}",
            )(x)
        return x


class Separator(nn.Module):
    """(B, T', N) -> (B, n_src, T', N) (reference galrnet.py Separator:166)."""

    num_features: int
    hidden_channels: int = 128
    chunk_size: int = 100
    hop_size: int = 50
    down_chunk_size: Optional[int] = None
    num_blocks: int = 6
    num_heads: int = 4
    norm: bool = True
    mask_nonlinear: str = "relu"
    low_dimension: bool = True
    causal: bool = True
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, N = x.shape
        K, P = self.chunk_size, self.hop_size
        padding = (P - (T - K) % P) % P
        pl, pr = padding // 2, padding - padding // 2
        h = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
        h = segment(h, K, P)  # (B, S, K, N)
        Bc, S, Kc, Nc = h.shape
        norm_name = "cLN" if self.causal else "gLN"
        h = h.reshape(Bc, S * Kc, Nc)
        h = choose_layer_norm(norm_name, Nc, causal=self.causal, eps=self.eps)(h)
        h = h.reshape(Bc, S, Kc, Nc)
        h = GALR(
            self.num_features, self.hidden_channels,
            num_blocks=self.num_blocks, num_heads=self.num_heads,
            norm=self.norm, low_dimension=self.low_dimension,
            chunk_size=K, down_chunk_size=self.down_chunk_size,
            causal=self.causal, eps=self.eps, name="galr",
        )(h)
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
class GALRNet(nn.Module, LatentMaskingMixin, SeparationModelMixin):
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
    sep_hidden_channels: int = 128
    sep_chunk_size: int = 100
    sep_hop_size: int = 50
    sep_down_chunk_size: Optional[int] = None
    sep_num_blocks: int = 6
    sep_num_heads: int = 4
    sep_norm: bool = True
    mask_nonlinear: str = "relu"
    low_dimension: bool = True
    causal: bool = True
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
            hidden_channels=self.sep_hidden_channels,
            chunk_size=self.sep_chunk_size,
            hop_size=self.sep_hop_size,
            down_chunk_size=self.sep_down_chunk_size,
            num_blocks=self.sep_num_blocks,
            num_heads=self.sep_num_heads,
            norm=self.sep_norm,
            mask_nonlinear=self.mask_nonlinear,
            low_dimension=self.low_dimension,
            causal=self.causal,
            n_sources=self.n_sources,
            eps=self.eps,
        )
