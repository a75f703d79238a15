"""X-UMX (CrossNet-Open-Unmix): UMX backbones bridged across sources.

Capability parity: reference `src/models/xumx.py` (CrossNetOpenUnmix:21,
forward_bridge:143-182, forward_no_bridge:100): per-source input blocks,
then (bridge mode) the LSTM of EVERY source consumes the MEAN of the block
outputs, and the per-source fc heads consume the MEAN of the concatenated
LSTM outputs. Sawata et al., arXiv:2010.04228.

TPU-first: the per-source loops become a stacked source axis; the two
bridging means are single jnp.mean reductions over that axis.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model
from .umx import EPS, TransformBlock1d, __sources__


@register_model
class CrossNetOpenUnmix(nn.Module, SeparationModelMixin):
    """(B, 1, C, n_bins, n_frames) -> (B, n_sources, C, n_bins, n_frames)."""

    in_channels: int
    hidden_channels: int = 512
    num_layers: int = 3
    n_bins: Optional[int] = None
    max_bin: Optional[int] = None
    dropout: Optional[float] = None
    causal: bool = False
    rnn_type: str = "lstm"
    bridge: bool = True
    sources: Tuple[str, ...] = tuple(__sources__)
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        assert self.n_bins is not None, "Specify `n_bins`."
        n_bins = self.n_bins
        max_bin = self.max_bin or n_bins
        C, H = self.in_channels, self.hidden_channels
        x_in = input[:, 0]  # (B, C, n_bins, T)
        B = x_in.shape[0]
        n_frames = x_in.shape[-1]
        x_valid = x_in[:, :, :max_bin]

        # Per-source input blocks.
        blocks = []
        for source in self.sources:
            scale_in = self.param(f"scale_in_{source}", nn.initializers.ones, (max_bin,))
            bias_in = self.param(f"bias_in_{source}", nn.initializers.zeros, (max_bin,))
            h = (x_valid - bias_in[:, None]) / (jnp.abs(scale_in[:, None]) + self.eps)
            h = jnp.transpose(h, (0, 3, 1, 2)).reshape(B, n_frames, C * max_bin)
            h = TransformBlock1d(H, nonlinear="tanh", name=f"block_{source}")(h, train=train)
            blocks.append(h)
        stacked = jnp.stack(blocks, axis=0)  # (n_src, B, T, H)

        rnn_hidden = H if self.causal else H // 2
        if self.bridge:
            rnn_in = jnp.mean(stacked, axis=0)  # bridging mean (reference :160)

        rnn_cat = []
        for idx, source in enumerate(self.sources):
            src_in = rnn_in if self.bridge else stacked[idx]
            h_rnn = choose_rnn(
                self.rnn_type, rnn_hidden, num_layers=self.num_layers,
                bidirectional=not self.causal, dropout=self.dropout or 0.0,
                parent_name=f"rnn_{source}",
            )(src_in, train=train)
            rnn_cat.append(jnp.concatenate([stacked[idx], h_rnn], axis=-1))
        rnn_cat = jnp.stack(rnn_cat, axis=0)  # (n_src, B, T, 2H)

        if self.bridge:
            head_in = jnp.mean(rnn_cat, axis=0)  # second bridging mean (:171)

        outputs = []
        for idx, source in enumerate(self.sources):
            h = head_in if self.bridge else rnn_cat[idx]
            h = TransformBlock1d(H, nonlinear="relu", name=f"net0_{source}")(h, train=train)
            h = TransformBlock1d(C * n_bins, name=f"net1_{source}")(h, train=train)
            h = h.reshape(B, n_frames, C, n_bins)
            h = jnp.transpose(h, (0, 2, 3, 1))
            scale_out = self.param(f"scale_out_{source}", nn.initializers.ones, (n_bins,))
            bias_out = self.param(f"bias_out_{source}", nn.initializers.zeros, (n_bins,))
            h = scale_out[:, None] * h + bias_out[:, None]
            outputs.append(nn.relu(h) * x_in)
        return jnp.stack(outputs, axis=1)
