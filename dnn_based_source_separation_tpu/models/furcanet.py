"""FurcaNet: gated-conv front end + stacked BiLSTM separator.

Capability parity: reference `src/models/furcanet.py` (FurcaNet:32,
GatedConvNet:62). The reference's furca_{sh,py,pa}.py companions are empty
stubs and are documented as such (SURVEY.md §2).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import choose_layer_norm
from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model
from .modules import choose_nonlinear

EPS = 1e-12


class GatedConvNet(nn.Module):
    """Stacked gated conv blocks on (B, T, C) (reference GatedConvNet:62)."""

    hidden_channels: int
    num_blocks: int = 10
    kernel_size: int = 3
    nonlinear: str = "sigmoid"
    norm: bool = True
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        for idx in range(self.num_blocks):
            pad = self.kernel_size - 1
            pl, pr = (pad, 0) if self.causal else (pad // 2, pad - pad // 2)
            h = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
            a = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="VALID", name=f"conv{idx}")(h)
            g = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="VALID", name=f"gate{idx}")(h)
            x = a * choose_nonlinear(self.nonlinear)(g)
            if self.norm:
                norm_name = "cLN" if self.causal else "gLN"
                x = choose_layer_norm(norm_name, self.hidden_channels, causal=self.causal, eps=self.eps)(x)
        return x


@register_model
class FurcaNet(nn.Module, SeparationModelMixin):
    """(B, 1, T) -> (B, n_sources, T) direct-regression separator."""

    conv_hidden_channels: int = 64
    rnn_hidden_channels: int = 64
    num_conv_blocks: int = 10
    num_rnn_blocks: int = 2
    kernel_size: int = 3
    nonlinear: str = "sigmoid"
    norm: bool = True
    causal: bool = False
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, input):
        x = jnp.moveaxis(input, 1, 2)  # (B, T, 1)
        x = GatedConvNet(
            self.conv_hidden_channels, self.num_conv_blocks, self.kernel_size,
            self.nonlinear, self.norm, self.causal, eps=self.eps, name="gcn",
        )(x)
        x = choose_rnn(
            "lstm", self.rnn_hidden_channels, num_layers=self.num_rnn_blocks,
            bidirectional=True, parent_name="rnn_blocks",
        )(x)
        x = nn.Dense(self.n_sources, name="fc")(x)
        return jnp.moveaxis(x, 1, 2)
