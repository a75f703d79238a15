"""DANet: deep attractor network (+ fixed-attractor variant).

Capability parity: reference `src/models/danet.py` (DANet:14,
extract_latent:76-146 with KMeans inference at :130,
FixedAttractorDANet:353). Chen et al., arXiv:1611.08930.

Train path: oracle attractors = threshold-weighted mean of embeddings per
source assignment. Inference: batched KMeans over embeddings; centroids act
as attractors. Mask = nonlinear(attractor . embedding).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..algorithm.clustering import KMeans
from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model

EPS = 1e-12


@register_model
class DANet(nn.Module, SeparationModelMixin):
    n_bins: int
    embed_dim: int = 20
    hidden_channels: int = 300
    num_blocks: int = 4
    dropout: float = 0.0
    causal: bool = False
    mask_nonlinear: str = "sigmoid"
    take_log: bool = True
    take_db: bool = False
    iter_clustering: int = 10
    eps: float = EPS

    def setup(self):
        self.rnn = choose_rnn(
            "lstm", self.hidden_channels, num_layers=self.num_blocks,
            bidirectional=not self.causal, dropout=self.dropout,
        )
        self.fc = nn.Dense(self.n_bins * self.embed_dim)

    def _embed(self, input, train: bool = False):
        """(B, 1, F, T) amplitude -> latent (B, F*T, D)."""
        B, _, F, T = input.shape
        if self.take_log and self.take_db:
            raise ValueError("Either take_log or take_db should be False.")
        if self.take_log:
            x = jnp.log(input + self.eps)
        elif self.take_db:
            x = 20.0 * jnp.log10(input + self.eps)
        else:
            x = input
        x = jnp.transpose(x[:, 0], (0, 2, 1))  # (B, T, F)
        x = self.rnn(x, train=train)
        x = self.fc(x)  # (B, T, D*F)
        x = x.reshape(B, T, self.embed_dim, F)
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, D, F, T)
        return x.reshape(B, self.embed_dim, F * T).transpose(0, 2, 1)  # (B, F*T, D)

    def _mask_from_attractor(self, attractor, latent, shape):
        B, _, F, T = shape
        similarity = jnp.einsum("bsd,bnd->bsn", attractor, latent)
        similarity = similarity.reshape(B, -1, F, T)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(similarity)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(similarity, axis=1)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")

    def __call__(self, input, assignment=None, threshold_weight=None, n_sources=None, train: bool = False):
        output, _, _ = self.extract_latent(input, assignment, threshold_weight, n_sources, train=train)
        return output

    def extract_latent(self, input, assignment=None, threshold_weight=None, n_sources=None, train: bool = False):
        """input: (B, 1, F, T) amplitude.

        Train (assignment given): attractors = weighted embedding means.
        Inference (assignment None): KMeans centroids over embeddings.
        Returns (output (B, n_src, F, T), latent (B, F, T, D), attractor).
        """
        B, _, F, T = input.shape
        latent = self._embed(input, train=train)  # (B, F*T, D)

        if assignment is None:
            if n_sources is None:
                raise ValueError("Specify n_sources for clustering inference.")
            kmeans = KMeans(n_sources, n_iterations=self.iter_clustering)
            _, attractor = kmeans(latent)
        else:
            n_src = assignment.shape[1]
            a = assignment.reshape(B, n_src, F * T)
            if threshold_weight is not None:
                a = threshold_weight.reshape(B, 1, F * T) * a
            attractor = jnp.einsum("bsn,bnd->bsd", a, latent) / (
                jnp.sum(a, axis=2, keepdims=True) + self.eps
            )

        mask = self._mask_from_attractor(attractor, latent, input.shape)
        output = mask * input
        return output, latent.reshape(B, F, T, self.embed_dim), attractor

    def extract_latent_by_attractor(self, input, attractor):
        """Separate with externally provided attractors (reference :160)."""
        B, _, F, T = input.shape
        latent = self._embed(input)
        if attractor.ndim == 2:
            attractor = jnp.broadcast_to(attractor[None], (B,) + attractor.shape)
        mask = self._mask_from_attractor(attractor, latent, input.shape)
        return mask * input, latent.reshape(B, F, T, self.embed_dim)


@register_model
class FixedAttractorDANet(nn.Module, SeparationModelMixin):
    """DANet with learned fixed attractors (reference FixedAttractorDANet:353)."""

    n_bins: int
    embed_dim: int = 20
    hidden_channels: int = 300
    num_blocks: int = 4
    n_sources: int = 2
    dropout: float = 0.0
    causal: bool = False
    mask_nonlinear: str = "sigmoid"
    take_log: bool = True
    take_db: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, input):
        base = DANet(
            self.n_bins, self.embed_dim, self.hidden_channels, self.num_blocks,
            self.dropout, self.causal, self.mask_nonlinear,
            self.take_log, self.take_db, eps=self.eps, name="base",
        )
        attractor = self.param(
            "attractor", nn.initializers.orthogonal(), (self.n_sources, self.embed_dim)
        )
        output, _ = base.extract_latent_by_attractor(input, attractor)
        return output
