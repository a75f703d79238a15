"""Entropy criteria: binary / categorical cross-entropy with batch_mean.

Capability parity: reference `src/criterion/entropy.py:6-71` and the dice
loss of `src/criterion/semantic_segmentation.py:6`.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class BinaryCrossEntropy:
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        """input: probabilities in [0,1]; target: {0,1}; shapes (B, ...)."""
        p = jnp.clip(input, self.eps, 1.0 - self.eps)
        loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
        loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss


@dataclasses.dataclass(frozen=True)
class CategoricalCrossEntropy:
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        """input: probabilities over classes (last axis); target: one-hot."""
        p = jnp.clip(input, self.eps, 1.0)
        loss = -jnp.sum(target * jnp.log(p), axis=-1)
        if loss.ndim > 1:
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss


@dataclasses.dataclass(frozen=True)
class DiceLoss:
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        axes = tuple(range(1, input.ndim))
        num = 2.0 * jnp.sum(input * target, axis=axes)
        den = jnp.sum(input, axis=axes) + jnp.sum(target, axis=axes)
        loss = 1.0 - (num + self.eps) / (den + self.eps)
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss
