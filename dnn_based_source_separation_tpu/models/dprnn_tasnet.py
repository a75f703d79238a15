"""DPRNN-TasNet: Conv-TasNet skeleton with a dual-path recurrent separator.

Capability parity: reference `src/models/dprnn_tasnet.py` (DPRNNTasNet:15,
Separator:288): encoder -> norm + 1x1 bottleneck -> segment -> DPRNN ->
overlap-add -> PReLU -> mask head. Luo et al., arXiv:1910.06379.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.filterbank import choose_filterbank
from ..ops.norms import choose_layer_norm
from ..ops.segment import overlap_add, segment
from .base import SeparationModelMixin, register_model
from .dprnn import DPRNN
from .modules import PReLU
from .skeleton import LatentMaskingMixin

EPS = 1e-12


class Separator(nn.Module):
    """(B, T', N) -> (B, n_src, T', N) via dual-path chunking (reference :288)."""

    num_features: int
    bottleneck_channels: int = 64
    hidden_channels: int = 128
    chunk_size: int = 100
    hop_size: int = 50
    num_blocks: int = 6
    norm: bool = True
    mask_nonlinear: str = "sigmoid"
    causal: bool = True
    rnn_type: str = "lstm"
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, N = x.shape
        K, P = self.chunk_size, self.hop_size

        norm_name = "cLN" if self.causal else "gLN"
        h = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps)(x)
        h = nn.Dense(self.bottleneck_channels, name="bottleneck_conv1d")(h)

        padding = (P - (T - K) % P) % P
        pl, pr = padding // 2, padding - padding // 2
        h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))
        h = segment(h, K, P)  # (B, S, K, F)
        h = DPRNN(
            self.bottleneck_channels, self.hidden_channels,
            num_blocks=self.num_blocks, norm=self.norm, causal=self.causal,
            rnn_type=self.rnn_type, eps=self.eps, name="dprnn",
        )(h)
        h = overlap_add(h, P)  # (B, T + padding, F)
        h = h[:, pl : h.shape[1] - pr]
        h = PReLU(name="prelu")(h)
        h = nn.Dense(self.n_sources * self.num_features, name="mask_conv1d")(h)
        h = h.reshape(B, T, self.n_sources, self.num_features)
        h = jnp.moveaxis(h, 2, 1)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(h)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(h, axis=1)
        if self.mask_nonlinear == "relu":
            return nn.relu(h)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")


@register_model
class DPRNNTasNet(nn.Module, LatentMaskingMixin, SeparationModelMixin):
    """Public API matches the reference: (B, 1, T) -> (B, n_sources, T)."""

    n_basis: int
    kernel_size: int
    stride: Optional[int] = None
    enc_basis: Optional[str] = "trainable"
    dec_basis: Optional[str] = "trainable"
    enc_nonlinear: Optional[str] = None
    window_fn: str = "hann"
    enc_onesided: bool = True
    enc_return_complex: bool = True
    sep_bottleneck_channels: int = 64
    sep_hidden_channels: int = 128
    sep_chunk_size: int = 100
    sep_hop_size: int = 50
    sep_num_blocks: int = 6
    sep_norm: bool = True
    mask_nonlinear: str = "sigmoid"
    causal: bool = True
    rnn_type: str = "lstm"
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
            norm=self.sep_norm,
            mask_nonlinear=self.mask_nonlinear,
            causal=self.causal,
            rnn_type=self.rnn_type,
            n_sources=self.n_sources,
            eps=self.eps,
        )
