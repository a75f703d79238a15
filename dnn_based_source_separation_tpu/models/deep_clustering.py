"""Deep clustering: unit-norm TF-bin embeddings (+ Chimera multitask head).

Capability parity: reference `src/models/deep_clustering.py`
(DeepEmbedding:14, DeepEmbedding_pp:307, ChimeraNet:390). Hershey et al.,
arXiv:1508.04306; Luo et al. (Chimera), arXiv:1611.06265.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model

EPS = 1e-12


@register_model
class DeepEmbedding(nn.Module, SeparationModelMixin):
    """(B, 1, F, T) amplitude -> unit-norm embeddings (B, F, T, D)."""

    n_bins: int
    hidden_channels: int = 300
    embed_dim: int = 40
    num_layers: int = 2
    causal: bool = False
    rnn_type: str = "lstm"
    take_log: bool = True
    take_db: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, input):
        B, _, F, T = input.shape
        if self.take_log:
            x = jnp.log(input + self.eps)
        elif self.take_db:
            x = 20.0 * jnp.log10(input + self.eps)
        else:
            x = input
        x = jnp.transpose(x[:, 0], (0, 2, 1))  # (B, T, F)
        x = choose_rnn(
            self.rnn_type, self.hidden_channels, num_layers=self.num_layers,
            bidirectional=not self.causal, parent_name="rnn",
        )(x)
        x = nn.Dense(self.n_bins * self.embed_dim, name="fc")(x)
        x = x.reshape(B, T, F, self.embed_dim)
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, F, T, D)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / (norm + self.eps)


@register_model
class ChimeraNet(nn.Module, SeparationModelMixin):
    """Deep-clustering embeddings + mask head multitask (reference :390)."""

    n_bins: int
    hidden_channels: int = 300
    embed_dim: int = 20
    num_layers: int = 2
    n_sources: int = 2
    causal: bool = False
    rnn_type: str = "lstm"
    take_log: bool = True
    take_db: bool = False
    mask_nonlinear: str = "softmax"
    eps: float = EPS

    @nn.compact
    def __call__(self, input):
        """Returns (mask (B, n_src, F, T), embeddings (B, F, T, D))."""
        B, _, F, T = input.shape
        if self.take_log:
            x = jnp.log(input + self.eps)
        else:
            x = input
        x = jnp.transpose(x[:, 0], (0, 2, 1))
        h = choose_rnn(
            self.rnn_type, self.hidden_channels, num_layers=self.num_layers,
            bidirectional=not self.causal, parent_name="rnn",
        )(x)

        emb = nn.Dense(self.n_bins * self.embed_dim, name="fc_embedding")(h)
        emb = jnp.tanh(emb).reshape(B, T, F, self.embed_dim)
        emb = jnp.transpose(emb, (0, 2, 1, 3))
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + self.eps)

        mask = nn.Dense(self.n_bins * self.n_sources, name="fc_mask")(h)
        mask = mask.reshape(B, T, self.n_sources, F)
        mask = jnp.transpose(mask, (0, 2, 3, 1))  # (B, n_src, F, T)
        if self.mask_nonlinear == "softmax":
            mask = nn.softmax(mask, axis=1)
        elif self.mask_nonlinear == "sigmoid":
            mask = nn.sigmoid(mask)
        else:
            raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")
        return mask, emb


@register_model
class DeepEmbeddingPlus(nn.Module, SeparationModelMixin):
    """DC++ embedding head (reference DeepEmbedding_pp:307): sigmoid
    squashed unit-norm embeddings + a naive enhancement sub-net (which the
    reference leaves as identity, deep_clustering.py:390 forward)."""

    n_bins: int
    hidden_channels: int = 300
    embed_dim: int = 40
    num_layers: int = 4
    enh_hidden_channels: int = 600
    enh_num_layers: int = 2
    causal: bool = False
    rnn_type: str = "lstm"
    take_log: bool = True
    take_db: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, input):
        """(B, 1, F, T) or (B, F, T) amplitude -> (B, F, T, D) embeddings."""
        if input.ndim == 4:
            input = input[:, 0]
        B, F, T = input.shape
        if self.take_log:
            x = jnp.log(input + self.eps)
        elif self.take_db:
            x = 20.0 * jnp.log10(input + self.eps)
        else:
            x = input
        x = jnp.transpose(x, (0, 2, 1))
        x = choose_rnn(
            self.rnn_type, self.hidden_channels, num_layers=self.num_layers,
            bidirectional=not self.causal, parent_name="rnn",
        )(x)
        x = nn.Dense(self.n_bins * self.embed_dim, name="fc")(x)
        x = x.reshape(B, T, F, self.embed_dim)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + self.eps)
        return nn.sigmoid(x)


# Reference-name alias.
DeepEmbedding_pp = DeepEmbeddingPlus
