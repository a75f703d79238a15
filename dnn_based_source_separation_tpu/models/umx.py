"""Open-Unmix (UMX): BLSTM spectrogram masking for music source separation.

Capability parity: reference `src/models/umx.py` (OpenUnmix:212,
ParallelOpenUnmix:20, TransformBlock1d:533, learned input/output per-bin
affine at :272-293/:334-356, max_bin cropping). Stoeter et al.,
"Open-Unmix -- A Reference Implementation for Music Source Separation".

I/O matches the reference: (B, in_channels, n_bins, n_frames) magnitude
spectrogram -> same-shape masked magnitude. Internally channels-last
(B, frames, features) so the per-frame fc blocks are MXU matmuls.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model

EPS = 1e-12
SAMPLE_RATE_MUSDB18 = 44100
__sources__ = ["bass", "drums", "other", "vocals"]


class TransformBlock1d(nn.Module):
    """Linear (no bias) -> BatchNorm -> optional nonlinear (reference :533)."""

    out_features: int
    nonlinear: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.out_features, use_bias=False, name="linear")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm"
        )(x)
        if self.nonlinear == "tanh":
            x = jnp.tanh(x)
        elif self.nonlinear == "relu":
            x = nn.relu(x)
        elif self.nonlinear is not None:
            raise ValueError(f"Unsupported nonlinearity: {self.nonlinear}")
        return x


@register_model
class OpenUnmix(nn.Module, SeparationModelMixin):
    in_channels: int
    hidden_channels: int = 512
    num_layers: int = 3
    n_bins: Optional[int] = None
    max_bin: Optional[int] = None
    dropout: Optional[float] = None
    causal: bool = False
    rnn_type: str = "lstm"
    eps: float = EPS

    def _dims(self) -> Tuple[int, int]:
        assert self.n_bins is not None, "Specify `n_bins`."
        max_bin = self.max_bin or self.n_bins
        return self.n_bins, max_bin

    @nn.compact
    def __call__(self, input, train: bool = False):
        """(B, C, n_bins, n_frames) -> (B, C, n_bins, n_frames)."""
        n_bins, max_bin = self._dims()
        C, H = self.in_channels, self.hidden_channels
        B = input.shape[0]
        n_frames = input.shape[-1]

        scale_in = self.param("scale_in", nn.initializers.ones, (max_bin,))
        bias_in = self.param("bias_in", nn.initializers.zeros, (max_bin,))
        scale_out = self.param("scale_out", nn.initializers.ones, (n_bins,))
        bias_out = self.param("bias_out", nn.initializers.zeros, (n_bins,))

        x_valid = input[:, :, :max_bin]  # (B, C, max_bin, T)
        x = (x_valid - bias_in[:, None]) / (jnp.abs(scale_in[:, None]) + self.eps)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, n_frames, C * max_bin)

        x = TransformBlock1d(H, nonlinear="tanh", name="block")(x, train=train)

        rnn_hidden = H if self.causal else H // 2
        x_rnn = choose_rnn(
            self.rnn_type, rnn_hidden, num_layers=self.num_layers,
            bidirectional=not self.causal, dropout=self.dropout or 0.0,
            parent_name="rnn",
        )(x, train=train)
        x = jnp.concatenate([x, x_rnn], axis=-1)  # (B, T, 2H)

        x = TransformBlock1d(H, nonlinear="relu", name="net0")(x, train=train)
        x = TransformBlock1d(C * n_bins, name="net1")(x, train=train)
        x = x.reshape(B, n_frames, C, n_bins)
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, C, n_bins, T)

        x = scale_out[:, None] * x + bias_out[:, None]
        mask = nn.relu(x)
        return mask * input


@register_model
class ParallelOpenUnmix(nn.Module, SeparationModelMixin):
    """One OpenUnmix per stem (reference ParallelOpenUnmix:20).

    (B, 1, C, n_bins, n_frames) -> (B, n_sources, C, n_bins, n_frames).
    """

    in_channels: int
    hidden_channels: int = 512
    num_layers: int = 3
    n_bins: Optional[int] = None
    max_bin: Optional[int] = None
    dropout: Optional[float] = None
    causal: bool = False
    rnn_type: str = "lstm"
    sources: Tuple[str, ...] = tuple(__sources__)
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        x = input[:, 0]  # (B, C, n_bins, T)
        outputs = []
        for source in self.sources:
            y = OpenUnmix(
                self.in_channels, self.hidden_channels, self.num_layers,
                n_bins=self.n_bins, max_bin=self.max_bin, dropout=self.dropout,
                causal=self.causal, rnn_type=self.rnn_type, eps=self.eps,
                name=f"backbone_{source}",
            )(x, train=train)
            outputs.append(y)
        return jnp.stack(outputs, axis=1)
