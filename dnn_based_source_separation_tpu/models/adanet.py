"""ADANet: anchored deep attractor network.

Capability parity: reference `src/models/adanet.py` (ADANet:14): learned
anchors; for every anchor combination compute soft assignments ->
attractors; select the combination minimizing the maximum pairwise
attractor similarity. Luo et al., "Speaker-independent speech separation
with deep attractor network".

TPU-first: the reference's Python loop over anchor combinations
(`adanet.py:96-118`) becomes a vmap over a precomputed pattern index table.
"""
from __future__ import annotations

import itertools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model

EPS = 1e-12


@register_model
class ADANet(nn.Module, SeparationModelMixin):
    n_bins: int
    embed_dim: int = 20
    hidden_channels: int = 600
    num_blocks: int = 4
    num_anchors: int = 6
    dropout: float = 0.5
    causal: bool = False
    mask_nonlinear: str = "sigmoid"
    take_log: bool = True
    take_db: bool = False
    permute_anchors: bool = False
    eps: float = EPS

    def __call__(self, input, threshold_weight=None, n_sources: int = 2, train: bool = False):
        output, _, _ = self.extract_latent(input, threshold_weight, n_sources, train=train)
        return output

    @nn.compact
    def extract_latent(self, input, threshold_weight=None, n_sources: int = 2, train: bool = False):
        B, _, F, T = input.shape
        D = self.embed_dim
        eps = self.eps

        anchor = self.param(
            "anchor", nn.initializers.orthogonal(), (self.num_anchors, D)
        )
        if self.permute_anchors:
            patterns = list(itertools.permutations(range(self.num_anchors), n_sources))
        else:
            patterns = list(itertools.combinations(range(self.num_anchors), n_sources))
        patterns = jnp.asarray(np.asarray(patterns, np.int32))  # (P, n_src)

        if self.take_log:
            x = jnp.log(input + eps)
        elif self.take_db:
            x = 20.0 * jnp.log10(input + eps)
        else:
            x = input
        x = jnp.transpose(x[:, 0], (0, 2, 1))
        x = choose_rnn(
            "lstm", self.hidden_channels, num_layers=self.num_blocks,
            bidirectional=not self.causal, dropout=self.dropout,
            parent_name="rnn",
        )(x, train=train)
        x = nn.Dense(self.n_bins * D, name="fc")(x)
        x = x.reshape(B, T, D, F)
        latent = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, D, F * T).transpose(0, 2, 1)

        tw = None
        if threshold_weight is not None:
            tw = threshold_weight.reshape(B, 1, F * T)

        def per_pattern(pattern):
            anchors = anchor[pattern]  # (n_src, D)
            distance = jnp.einsum("sd,bnd->bsn", anchors, latent)
            assign = nn.softmax(distance, axis=1)  # (B, n_src, F*T)
            if tw is not None:
                assign = tw * assign
            attr = jnp.einsum("bsn,bnd->bsd", assign, latent) / (
                jnp.sum(assign, axis=2, keepdims=True) + eps
            )
            sim = jnp.einsum("bsd,btd->bst", attr, attr)  # (B, n_src, n_src)
            triu = jnp.triu(sim, k=1).reshape(B, -1)
            return attr, jnp.max(triu, axis=1)

        attractors, max_sim = jax.vmap(per_pattern)(patterns)  # (P,B,s,D), (P,B)
        best = jnp.argmin(max_sim, axis=0)  # (B,)
        attractor = jnp.take_along_axis(
            jnp.moveaxis(attractors, 0, 1), best[:, None, None, None], axis=1
        )[:, 0]  # (B, n_src, D)

        similarity = jnp.einsum("bsd,bnd->bsn", attractor, latent).reshape(B, n_sources, F, T)
        if self.mask_nonlinear == "sigmoid":
            mask = nn.sigmoid(similarity)
        elif self.mask_nonlinear == "softmax":
            mask = nn.softmax(similarity, axis=1)
        else:
            raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")
        output = mask * input
        return output, latent.reshape(B, F, T, D), attractor
