"""Distance criteria: L1/L2/MSE/MAE/cosine.

Capability parity: reference `src/criterion/distance.py:7-303` (L1Loss,
L2Loss, MSE/MAE with dim arguments, cosine similarity).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

EPS = 1e-12


def _dims(x, dim):
    if dim is None:
        return tuple(range(1, x.ndim))
    return (dim,) if isinstance(dim, int) else tuple(dim)


@dataclasses.dataclass(frozen=True)
class L1Loss:
    dim: object = None
    reduction: str | None = "mean"
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = jnp.sum(jnp.abs(input - target), axis=_dims(input, self.dim))
        if self.reduction == "mean" and loss.ndim > 1:
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss


@dataclasses.dataclass(frozen=True)
class L2Loss:
    dim: object = None
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = jnp.sqrt(jnp.sum(jnp.square(input - target), axis=_dims(input, self.dim)) + self.eps)
        if self.reduction == "mean" and loss.ndim > 1:
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss


@dataclasses.dataclass(frozen=True)
class MSELoss:
    dim: object = None
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = jnp.mean(jnp.square(input - target), axis=_dims(input, self.dim))
        if loss.ndim > 1:
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss


@dataclasses.dataclass(frozen=True)
class MAELoss:
    dim: object = None
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = jnp.mean(jnp.abs(input - target), axis=_dims(input, self.dim))
        if loss.ndim > 1:
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss


@dataclasses.dataclass(frozen=True)
class CosineSimilarityLoss:
    dim: int = -1
    eps: float = EPS
    maximize: bool = dataclasses.field(default=True, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        num = jnp.sum(input * target, axis=self.dim)
        den = jnp.linalg.norm(input, axis=self.dim) * jnp.linalg.norm(target, axis=self.dim)
        loss = num / (den + self.eps)
        if loss.ndim > 1:
            loss = jnp.mean(loss, axis=tuple(range(1, loss.ndim)))
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss
