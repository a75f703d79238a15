"""Metric-learning criteria: triplet, contrastive, ArcFace-style.

Capability parity: reference `src/criterion/metric_learn.py:9-205` (used by
the tutorial recipes for embedding training).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class TripletLoss:
    margin: float = 1.0
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, anchor, positive, negative, batch_mean: bool = True):
        dp = jnp.sum(jnp.square(anchor - positive), axis=-1)
        dn = jnp.sum(jnp.square(anchor - negative), axis=-1)
        loss = jnp.maximum(dp - dn + self.margin, 0.0)
        if batch_mean:
            loss = jnp.mean(loss)
        return loss


@dataclasses.dataclass(frozen=True)
class ContrastiveLoss:
    margin: float = 1.0
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, x1, x2, label, batch_mean: bool = True):
        """label: 1 = same class, 0 = different."""
        d = jnp.sqrt(jnp.sum(jnp.square(x1 - x2), axis=-1) + EPS)
        loss = label * jnp.square(d) + (1 - label) * jnp.square(jnp.maximum(self.margin - d, 0.0))
        if batch_mean:
            loss = jnp.mean(loss)
        return loss


def arcface_logits(embeddings, weight, labels, margin: float = 0.5, scale: float = 64.0, eps: float = 1e-7):
    """ArcFace: add angular margin to the target class logit.

    embeddings: (B, D); weight: (n_classes, D); labels: (B,) int.
    Returns scaled cosine logits (B, n_classes) ready for cross-entropy.
    """
    e = embeddings / (jnp.linalg.norm(embeddings, axis=-1, keepdims=True) + EPS)
    w = weight / (jnp.linalg.norm(weight, axis=-1, keepdims=True) + EPS)
    cos = jnp.clip(e @ w.T, -1 + eps, 1 - eps)
    theta = jnp.arccos(cos)
    onehot = nn.one_hot(labels, weight.shape[0])
    cos_margin = jnp.cos(theta + margin)
    return scale * (onehot * cos_margin + (1 - onehot) * cos)
