"""LSTM-TasNet: the original TasNet with gated encoder + stacked (Bi)LSTM.

Capability parity: reference `src/models/tasnet.py` (TasNet:70,
Separator:302; alias LSTMTasNet in `src/models/lstm_tasnet.py:1-3`):
gated conv encoder -> per-frame affine channel norm -> num_blocks stacked
RNNs with skip sums -> fc -> softmax mask over sources.
Luo & Mesgarani, arXiv:1711.00541.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.filterbank import choose_filterbank
from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model
from .skeleton import LatentMaskingMixin

EPS = 1e-12


class Separator(nn.Module):
    """(B, T', N) -> (B, n_src, T', N) (reference tasnet.py:302-380)."""

    n_basis: int
    num_blocks: int
    num_layers: int
    hidden_channels: int
    causal: bool = False
    mask_nonlinear: str = "softmax"
    rnn_type: str = "lstm"
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, N = x.shape
        gamma = self.param("gamma", nn.initializers.ones, (N,))
        beta = self.param("beta", nn.initializers.zeros, (N,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
        # Note the reference's eps placement: / (sqrt(var) + eps).
        h = gamma * (x - mean) / (jnp.sqrt(var) + self.eps) + beta

        skip = 0.0
        for idx in range(self.num_blocks):
            h = choose_rnn(
                self.rnn_type, self.hidden_channels, num_layers=self.num_layers,
                bidirectional=not self.causal, parent_name=f"rnn{idx}",
            )(h)
            skip = h + skip
        h = nn.Dense(self.n_sources * self.n_basis, name="fc")(skip)
        h = h.reshape(B, T, self.n_sources, self.n_basis)
        h = jnp.moveaxis(h, 2, 1)  # (B, n_src, T, N)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(h, axis=1)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(h)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")


@register_model
class LSTMTasNet(nn.Module, LatentMaskingMixin, SeparationModelMixin):
    """Public API matches the reference: (B, 1, T) -> (B, n_sources, T)."""

    n_basis: int
    kernel_size: int = 40
    stride: Optional[int] = None
    enc_basis: str = "trainableGated"
    dec_basis: str = "trainable"
    sep_num_blocks: int = 2
    sep_num_layers: int = 2
    sep_hidden_channels: int = 500
    mask_nonlinear: str = "softmax"
    causal: bool = False
    rnn_type: str = "lstm"
    n_sources: int = 2
    eps: float = EPS
    in_channels: int = 1

    def setup(self):
        stride = self.stride or self.kernel_size // 2
        assert self.kernel_size % stride == 0
        assert self.enc_basis in ("trainable", "trainableGated") and self.dec_basis == "trainable"
        self._stride = stride
        encoder, decoder = choose_filterbank(
            self.n_basis, kernel_size=self.kernel_size, stride=stride,
            enc_basis=self.enc_basis, dec_basis=self.dec_basis,
            enc_nonlinear=None, in_channels=self.in_channels,
        )
        self.encoder = encoder
        self.decoder = decoder
        self.separator = Separator(
            n_basis=self.n_basis,
            num_blocks=self.sep_num_blocks,
            num_layers=self.sep_num_layers,
            hidden_channels=self.sep_hidden_channels,
            causal=self.causal,
            mask_nonlinear=self.mask_nonlinear,
            rnn_type=self.rnn_type,
            n_sources=self.n_sources,
            eps=self.eps,
        )


# Reference alias (src/models/lstm_tasnet.py)
TasNet = LSTMTasNet


class TasNetBase(nn.Module, SeparationModelMixin):
    """Fourier analysis/synthesis autoencoder (reference tasnet.py:13-69).

    (B, 1, T) -> (B, 1, T): pads to the stride grid, encodes with the
    (optionally trainable) Fourier filterbank and resynthesizes -- the
    filterbank-correctness harness of the reference's _test_fourier.
    """

    hidden_channels: int
    kernel_size: int
    stride: Optional[int] = None
    window_fn: str = "hann"
    enc_trainable: bool = False
    dec_trainable: bool = False
    onesided: bool = True
    return_complex: bool = True

    def setup(self):
        from ..ops.filterbank import FourierDecoder, FourierEncoder, compute_valid_basis

        stride = self.stride or self.kernel_size // 2
        assert self.kernel_size % stride == 0
        self._stride = stride
        n_basis = compute_valid_basis(self.hidden_channels, self.onesided, self.return_complex)
        self.encoder = FourierEncoder(
            n_basis, self.kernel_size, stride, window_fn=self.window_fn,
            trainable=self.enc_trainable, onesided=self.onesided,
            return_complex=self.return_complex,
        )
        self.decoder = FourierDecoder(
            n_basis, self.kernel_size, stride, window_fn=self.window_fn,
            trainable=self.dec_trainable, onesided=self.onesided,
        )

    def __call__(self, input):
        output, _ = self.extract_latent(input)
        return output

    def extract_latent(self, input):
        B, C, T = input.shape
        stride = self._stride
        padding = (stride - (T - self.kernel_size) % stride) % stride
        pl, pr = padding // 2, padding - padding // 2
        x = jnp.pad(input, ((0, 0), (0, 0), (pl, pr)))
        x = jnp.moveaxis(x, 1, 2)
        latent = self.encoder(x)
        y = self.decoder(latent)  # (B, T_pad, 1)
        y = jnp.moveaxis(y, 1, 2)
        end = y.shape[-1] - pr
        return y[..., pl:end], latent
