"""Wavesplit: speaker stack + FiLM-conditioned separation stack.

Capability parity: reference `src/models/wavesplit.py` (WaveSplitBase:13,
WaveSplit:214, SpeakerStack:321, SeparationStack:430, FiLMResidualBlock1d:
619, _SpeakerDistance:837, _SpeakerLoss:890): a dilated-TCN speaker stack
emits per-SAMPLE speaker vectors (unit-norm, one per source); training
sorts them per frame by a PIT speaker loss against learned speaker
embeddings; the separation stack is a dilated TCN whose layers are
FiLM-conditioned on the (sorted) speaker centroids and whose per-layer skip
heads are the per-layer source estimates. Zeghidour & Grangier,
arXiv:2002.08933.

TPU-first: per-frame speaker PIT is a vmap over the permutation table
applied to a (B, T, n_src, n_src) distance tensor; inference clustering
uses the batched KMeans from the algorithm layer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..algorithm.clustering import KMeans
from ..criterion.pit import permutation_table
from ..ops.norms import choose_layer_norm
from .base import SeparationModelMixin, register_model
from .modules import choose_nonlinear

EPS = 1e-12


class _ConvUnit(nn.Module):
    """(separable) dilated conv -> [nonlinear] -> [norm], channels-last."""

    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    separable: bool = True
    causal: bool = False
    nonlinear: Optional[str] = None
    norm: bool = True
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation
        pl, pr = (pad, 0) if self.causal else (pad // 2, pad - pad // 2)
        h = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))
        C = x.shape[-1]
        if self.separable:
            h = nn.Conv(C, (self.kernel_size,), kernel_dilation=(self.dilation,),
                        feature_group_count=C, padding="VALID", name="depthwise")(h)
            h = nn.Dense(self.out_channels, name="pointwise")(h)
        else:
            h = nn.Conv(self.out_channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
                        padding="VALID", name="conv")(h)
        if self.nonlinear:
            h = choose_nonlinear(self.nonlinear)(h)
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            h = choose_layer_norm(norm_name, self.out_channels, causal=self.causal, eps=self.eps)(h)
        return h


class SpeakerStack(nn.Module):
    """(B, T, 1) -> unit-norm speaker vectors (B, T, n_sources, latent_dim)."""

    latent_dim: int = 512
    kernel_size: int = 3
    num_layers: int = 14
    dilated: bool = True
    separable: bool = True
    causal: bool = False
    nonlinear: Optional[str] = None
    norm: bool = True
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        for idx in range(self.num_layers):
            dilation = 2**idx if self.dilated else 1
            out = self.n_sources * self.latent_dim if idx == self.num_layers - 1 else self.latent_dim
            residual = x if x.shape[-1] == out else None
            x = _ConvUnit(
                out, self.kernel_size, dilation=dilation, separable=self.separable,
                causal=self.causal, nonlinear=self.nonlinear, norm=self.norm,
                eps=self.eps, name=f"layer{idx}",
            )(x)
            if residual is not None:
                x = x + residual
        v = x.reshape(B, T, self.n_sources, self.latent_dim)
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + self.eps)


class SeparationStack(nn.Module):
    """(B, T, 1) + centroids (B, n_src, D) -> (B, n_src, T) estimates."""

    latent_dim: int = 512
    kernel_size_in: int = 4
    kernel_size: int = 3
    num_blocks: int = 4
    num_layers: int = 10
    dilated: bool = True
    separable: bool = True
    causal: bool = False
    nonlinear: Optional[str] = None
    norm: bool = True
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x, spk_centroids, return_all: bool = False):
        B, T, _ = x.shape
        pad = self.kernel_size_in - 1
        h = jnp.pad(x, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        h = nn.Conv(self.latent_dim, (self.kernel_size_in,), padding="VALID", name="conv_in")(h)

        cond = spk_centroids.reshape(B, -1)  # (B, n_src * D)
        skips = []
        for b in range(self.num_blocks):
            for l in range(self.num_layers):
                dilation = 2**l if self.dilated else 1
                gamma = nn.Dense(self.latent_dim, name=f"film_gamma_{b}_{l}")(cond)
                beta = nn.Dense(self.latent_dim, name=f"film_beta_{b}_{l}")(cond)
                residual = h
                y = _ConvUnit(
                    self.latent_dim, self.kernel_size, dilation=dilation,
                    separable=self.separable, causal=self.causal,
                    nonlinear=self.nonlinear, norm=self.norm, eps=self.eps,
                    name=f"block{b}_layer{l}",
                )(h)
                y = gamma[:, None, :] * y + beta[:, None, :]  # FiLM
                skips.append(nn.Dense(self.n_sources, name=f"skip_{b}_{l}")(y))
                last = b == self.num_blocks - 1 and l == self.num_layers - 1
                if not last:
                    h = residual + nn.Dense(self.latent_dim, name=f"out_{b}_{l}")(y)

        if return_all:
            return jnp.stack([jnp.moveaxis(s, 1, 2) for s in skips], axis=1)
        return jnp.moveaxis(skips[-1], 1, 2)  # (B, n_src, T)


@register_model
class WaveSplit(nn.Module, SeparationModelMixin):
    """Public API: __call__(mixture (B, 1, T), sorted_idx=None) -> sources.

    Training: pass sorted_idx (B, T, n_src) from the speaker loss (oracle
    ordering). Inference (sorted_idx=None): batched KMeans over the speaker
    vectors yields centroids.
    """

    latent_dim: int = 512
    n_sources: int = 2
    n_training_sources: int = 10
    spk_kernel_size: int = 3
    spk_num_layers: int = 14
    sep_kernel_size_in: int = 4
    sep_kernel_size: int = 3
    sep_num_blocks: int = 4
    sep_num_layers: int = 10
    dilated: bool = True
    separable: bool = True
    causal: bool = False
    nonlinear: Optional[str] = None
    norm: bool = True
    iter_clustering: int = 10
    eps: float = EPS

    def setup(self):
        self.speaker_stack = SpeakerStack(
            latent_dim=self.latent_dim, kernel_size=self.spk_kernel_size,
            num_layers=self.spk_num_layers, dilated=self.dilated,
            separable=self.separable, causal=self.causal,
            nonlinear=self.nonlinear, norm=self.norm,
            n_sources=self.n_sources, eps=self.eps,
        )
        self.separation_stack = SeparationStack(
            latent_dim=self.latent_dim, kernel_size_in=self.sep_kernel_size_in,
            kernel_size=self.sep_kernel_size, num_blocks=self.sep_num_blocks,
            num_layers=self.sep_num_layers, dilated=self.dilated,
            separable=self.separable, causal=self.causal,
            nonlinear=self.nonlinear, norm=self.norm,
            n_sources=self.n_sources, eps=self.eps,
        )
        self.spk_embedding = self.param(
            "spk_embedding", nn.initializers.normal(1.0),
            (self.n_training_sources, self.latent_dim),
        )

    def speaker_vectors(self, mixture):
        """(B, 1, T) -> (B, T, n_src, D)."""
        x = jnp.moveaxis(mixture, 1, 2)
        return self.speaker_stack(x)

    def all_speaker_embedding(self):
        return self.spk_embedding

    def __call__(self, mixture, sorted_idx=None, return_all_layers: bool = False,
                 return_spk_vector: bool = False):
        x = jnp.moveaxis(mixture, 1, 2)  # (B, T, 1)
        v = self.speaker_stack(x)  # (B, T, n_src, D)
        B, T, S, D = v.shape

        if sorted_idx is not None:
            onehot = jax.nn.one_hot(sorted_idx, S, dtype=v.dtype)  # (B, T, S_out, S_in)
            sorted_v = jnp.einsum("btos,btsd->btod", onehot, v)
            centroids = jnp.mean(sorted_v, axis=1)  # (B, n_src, D)
        else:
            flat = v.reshape(B, T * S, D)
            _, centroids = KMeans(self.n_sources, n_iterations=self.iter_clustering)(flat)
            sorted_v = v

        est = self.separation_stack(x, centroids, return_all=return_all_layers)
        if return_spk_vector:
            return est, sorted_v
        return est

    def forward_train(self, mixture, spk_idx, gaussian: bool = False):
        """Training forward (reference wavesplit adhoc_driver.py:128-170).

        Computes the per-frame PIT speaker loss against the utterance's
        speaker-embedding rows, sorts the speaker vectors with the winning
        permutation (no grad through the integer argmin), and conditions the
        separation stack on the sorted centroids.

        Returns (per-layer estimates (B, n_layers, n_src, T), speaker loss (B,)).
        """
        x = jnp.moveaxis(mixture, 1, 2)  # (B, T, 1)
        v = self.speaker_stack(x)  # (B, T, n_src, D)
        emb = self.spk_embedding[spk_idx]  # (B, n_src, D)
        spk_loss, sorted_idx = speaker_distance_loss(
            v, emb, self.spk_embedding, spk_idx, gaussian=gaussian, eps=self.eps,
        )
        onehot = jax.nn.one_hot(sorted_idx, self.n_sources, dtype=v.dtype)
        sorted_v = jnp.einsum("btos,btsd->btod", onehot, v)
        centroids = jnp.mean(sorted_v, axis=1)  # (B, n_src, D)
        est_all = self.separation_stack(x, centroids, return_all=True)
        return est_all, spk_loss


def entropy_regularization_loss(spk_embedding, eps: float = EPS):
    """Push speaker-embedding rows apart (reference wavesplit
    adhoc_criterion.py:273-306, EntropyRegularizationLoss): -sum over rows of
    log distance to the nearest other row.
    """
    n = spk_embedding.shape[0]
    sq = jnp.sum(jnp.square(spk_embedding[:, None] - spk_embedding[None]), axis=-1)
    # sqrt(sq + eps): the plain norm has a NaN gradient at the zero diagonal.
    d = jnp.sqrt(sq + eps)
    d = d + 2.0 * jnp.max(d) * jnp.eye(n, dtype=d.dtype)
    return -jnp.sum(jnp.log(jnp.min(d, axis=-1) + eps))


def speaker_distance_loss(spk_vector, spk_embedding, all_spk_embedding,
                          spk_idx, gaussian: bool = False, scale=None, bias=None,
                          eps: float = EPS):
    """Per-frame PIT speaker loss (reference _SpeakerDistance:837/_SpeakerLoss:890).

    Args:
      spk_vector: (B, T, n_src, D) unit-norm per-frame speaker vectors.
      spk_embedding: (B, n_src, D) target speakers' embeddings (table rows).
      all_spk_embedding: (n_train, D) full table for the contrastive term.
      spk_idx: unused here (embeddings pre-gathered); kept for API parity.
    Returns:
      (loss (B,), sorted_idx (B, T, n_src))
    """
    B, T, S, D = spk_vector.shape

    def dist(v, e):
        d = jnp.sum(jnp.square(v - e), axis=-1)
        if gaussian and scale is not None:
            d = jnp.abs(scale) * d + bias
        return d

    # Pairwise per-frame distances: (B, T, S_vec, S_emb)
    pair = dist(spk_vector[:, :, :, None], spk_embedding[:, None, None])
    # Contrastive denominator vs the whole table: (B, T, S_vec)
    d_all = dist(spk_vector[:, :, :, None], all_spk_embedding[None, None, None])
    logz = jax.scipy.special.logsumexp(-d_all, axis=-1)

    perms = jnp.asarray(permutation_table(S))  # (P, S)

    def loss_for_perm(perm):
        # assignment: vector s -> embedding perm[s]
        sel = jnp.take_along_axis(pair, perm[None, None, :, None], axis=-1)[..., 0]
        return jnp.sum(sel + logz, axis=-1)  # (B, T)

    per_perm = jax.vmap(loss_for_perm)(perms)  # (P, B, T)
    best = jnp.argmin(per_perm, axis=0)  # (B, T)
    loss = jnp.min(per_perm, axis=0)  # (B, T)
    # The winning perm maps vector s -> embedding perm[s]; downstream
    # gathers want sorted_idx[o] = WHICH VECTOR belongs to source o, i.e.
    # the INVERSE permutation (identical only for n_sources = 2).
    inv_perms = jnp.argsort(perms, axis=-1)  # (P, S)
    sorted_idx = inv_perms[best]  # (B, T, S)
    return jnp.mean(loss, axis=-1), sorted_idx
