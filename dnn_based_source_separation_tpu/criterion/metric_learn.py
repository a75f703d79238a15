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


@dataclasses.dataclass(frozen=True)
class TripletWithDistanceLoss:
    """Triplet margin loss with a pluggable distance criterion
    (reference metric_learn.py:47)."""

    distance_fn: object
    margin: float = 1.0
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, anchor, positive, negative, batch_mean: bool = True):
        dp = self.distance_fn(positive, anchor, batch_mean=False)
        dn = self.distance_fn(negative, anchor, batch_mean=False)
        loss = jnp.maximum(dp + self.margin - dn, 0.0)
        if batch_mean:
            loss = jnp.mean(loss)
        return loss


@dataclasses.dataclass(frozen=True)
class ContrastiveWithDistanceLoss:
    """Contrastive loss with a pluggable distance criterion
    (reference metric_learn.py:96)."""

    distance_fn: object
    margin: float = 1.0
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, x1, x2, is_same, batch_mean: bool = True):
        d = self.distance_fn(x1, x2, batch_mean=False)
        loss = is_same * jnp.square(d) + (1 - is_same) * jnp.square(jnp.maximum(self.margin - d, 0.0))
        if batch_mean:
            loss = jnp.mean(loss)
        return loss


@dataclasses.dataclass(frozen=True)
class AdditiveAngularMarginLoss:
    """ArcFace loss over precomputed cosine logits
    (reference metric_learn.py:154 AdditiveAngularMarginLoss): the angular
    margin is applied via the addition theorem
    cos(th + m) = cos(th) cos(m) - sin(th) sin(m), with the reference's
    easy-margin / monotonicity fallback, then scaled cross-entropy.
    """

    scale: float = 30.0
    margin: float = 0.5
    easy_margin: bool = False
    eps: float = 1e-12
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, cos_th, target, batch_mean: bool = True):
        """cos_th: (B, n_classes) cosine logits; target: (B,) int labels."""
        import math

        import jax

        cos_m, sin_m = math.cos(self.margin), math.sin(self.margin)
        sin_th = jnp.sqrt(jnp.maximum(1.0 - jnp.square(cos_th), 0.0) + self.eps)
        cos_phi = cos_th * cos_m - sin_th * sin_m
        if self.easy_margin:
            cos_phi = jnp.where(cos_th < 0, cos_th, cos_phi)
        else:
            # NOTE: reproduces the reference's branch orientation verbatim
            # (metric_learn.py:195: where(cos_th > -cos m, cos_th - m sin m,
            # cos_phi)) -- the opposite of the usual ArcFace fallback, kept
            # for checkpoint/loss parity.
            cos_phi = jnp.where(cos_th > -cos_m, cos_th - self.margin * sin_m, cos_phi)
        mask = nn.one_hot(target, cos_th.shape[-1])
        logits = self.scale * (mask * cos_phi + (1.0 - mask) * cos_th)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.sum(mask * logp, axis=-1)
        if batch_mean:
            loss = jnp.mean(loss)
        return loss


class ImprovedTripletLoss:
    """Stub in the reference too (metric_learn.py:127)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Implement `ImprovedTripletLoss`")


class AdaptedTripletLoss:
    """Stub in the reference too (metric_learn.py:136)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Implement `AdaptedTripletLoss`")


class QuadrupletLoss:
    """Stub in the reference too (metric_learn.py:145)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Implement `QuadrupletLoss`")
