"""Permutation-invariant training: PIT / ORPIT / SinkPIT.

Capability parity: reference `src/criterion/pit.py:9-225`. Redesigned for
XLA: the reference's Python loop over `itertools.permutations`
(`pit.py:28-33`) becomes a `vmap` over a precomputed (n!, n) permutation
index table; ORPIT's per-utterance Python loop (`pit.py:120-160`) becomes a
`vmap` over a padded source axis with a count mask -- no PackedSequence.

All functions follow the reference protocol: criteria are callables
`(input, target, batch_mean=False) -> (B,)` with a `maximize` attribute.
"""
from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np


def permutation_table(n_sources: int) -> np.ndarray:
    """(n!, n) int32 table of all permutations of range(n_sources)."""
    return np.array(list(itertools.permutations(range(n_sources))), dtype=np.int32)


def pit(criterion, input, target, n_sources: int | None = None, patterns=None, batch_mean: bool = True):
    """Exhaustive-permutation PIT.

    Args:
      input: (B, n_sources, ...)
      target: (B, n_sources, ...)
    Returns:
      (loss, pattern): loss () or (B,); pattern (B, n_sources) -- the target
      permutation achieving the optimum, matching reference `pit.py:9-44`.
    """
    if patterns is None:
        n = n_sources if n_sources is not None else input.shape[1]
        patterns = permutation_table(n)
    patterns = jnp.asarray(patterns)

    def loss_for_perm(perm):
        return criterion(input, target[:, perm], batch_mean=False)  # (B,)

    possible = jax.vmap(loss_for_perm)(patterns)  # (P, B)
    possible = jnp.swapaxes(possible, 0, 1)  # (B, P)

    maximize = bool(getattr(criterion, "maximize", False))
    indices = jnp.argmax(possible, axis=1) if maximize else jnp.argmin(possible, axis=1)
    loss = jnp.take_along_axis(possible, indices[:, None], axis=1)[:, 0]

    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss, patterns[indices]


def orpit(criterion, input, target, n_sources=None, batch_mean: bool = True):
    """One-and-Rest PIT over a padded variable-source batch.

    Args:
      input: (B, 2, ...) -- the (one, rest) pair of estimates.
      target: (B, n_max, ...) -- zero-padded beyond each utterance's count.
      n_sources: (B,) int counts per utterance, or None for all = n_max.
    Returns:
      (loss, indices): the optimum of loss_one + loss_rest/(n_src-1) over the
      choice of which source is "one" (reference `pit.py:87-160`).
    """
    B, n_max = target.shape[0], target.shape[1]
    if n_sources is None:
        counts = jnp.full((B,), n_max, dtype=jnp.int32)
    else:
        counts = jnp.asarray(n_sources, dtype=jnp.int32)

    valid = jnp.arange(n_max)[None, :] < counts[:, None]  # (B, n_max)
    bshape = valid.shape + (1,) * (target.ndim - 2)
    target = target * valid.reshape(bshape)  # zero the padding

    input_one, input_rest = input[:, 0], input[:, 1]

    def loss_for_choice(idx):
        one_mask = (jnp.arange(n_max) == idx).reshape((1, n_max) + (1,) * (target.ndim - 2))
        target_one = jnp.sum(one_mask * target, axis=1)
        target_rest = jnp.sum((1.0 - one_mask) * target * valid.reshape(bshape), axis=1)
        loss_one = criterion(input_one, target_one, batch_mean=False)
        loss_rest = criterion(input_rest, target_rest, batch_mean=False)
        return loss_one + loss_rest / jnp.maximum(counts - 1, 1)

    possible = jax.vmap(loss_for_choice)(jnp.arange(n_max))  # (n_max, B)
    possible = jnp.swapaxes(possible, 0, 1)  # (B, n_max)

    maximize = bool(getattr(criterion, "maximize", False))
    sentinel = -jnp.inf if maximize else jnp.inf
    possible = jnp.where(valid, possible, sentinel)
    indices = jnp.argmax(possible, axis=1) if maximize else jnp.argmin(possible, axis=1)
    loss = jnp.take_along_axis(possible, indices[:, None], axis=1)[:, 0]

    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss, indices


def sinkpit(criterion, input, target, n_sources: int | None = None, coldness: float = 1.0,
            iteration: int = 10, batch_mean: bool = True):
    """Sinkhorn-relaxation PIT (arXiv:2010.11871), reference `pit.py:163-194`.

    Computes the (B, n, n) pairwise loss matrix with one vmap-ed criterion
    call, then runs log-domain Sinkhorn normalization to a doubly-stochastic
    soft permutation.
    """
    n = n_sources if n_sources is not None else input.shape[1]

    # Pairwise loss matrix C[b, i, j] = criterion(input_i, target_j).
    inp = jnp.repeat(input[:, :, None], n, axis=2)  # (B, n, n, ...)
    tgt = jnp.repeat(target[:, None, :], n, axis=1)
    flat_in = inp.reshape((-1,) + input.shape[2:])
    flat_tgt = tgt.reshape((-1,) + target.shape[2:])
    C = criterion(flat_in, flat_tgt, batch_mean=False).reshape(input.shape[0], n, n)

    maximize = bool(getattr(criterion, "maximize", False))
    if maximize:
        C = -C

    Z = -coldness * C
    for _ in range(iteration):
        Z = Z - jax.scipy.special.logsumexp(Z, axis=1, keepdims=True)
        Z = Z - jax.scipy.special.logsumexp(Z, axis=2, keepdims=True)

    P = jnp.exp(Z)
    loss = jnp.sum((C + Z / coldness) * P, axis=(1, 2))
    if maximize:
        loss = -loss
    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss, P


def prob_pit(criterion, input, target, n_sources: int | None = None, patterns=None,
             gamma: float = 1.0, batch_mean: bool = True):
    """Probabilistic PIT (Yousefi & Hansen 2019, arXiv:1908.01768) — a stub
    in the reference (`pit.py:215`), implemented here: instead of the hard
    min over permutations, marginalize over all of them with a soft-min,

        loss = -gamma * (logsumexp(-L_p / gamma) - log n!)

    which trains through EVERY permutation weighted by its likelihood
    (softmax(-L/gamma)) and converges to exhaustive PIT as gamma -> 0.
    Reuses the same vmap-over-permutation-table machinery as `pit`.

    Returns (loss, pattern) with pattern the most likely permutation.
    """
    if patterns is None:
        n = n_sources if n_sources is not None else input.shape[1]
        patterns = permutation_table(n)
    patterns = jnp.asarray(patterns)

    def loss_for_perm(perm):
        return criterion(input, target[:, perm], batch_mean=False)  # (B,)

    possible = jax.vmap(loss_for_perm)(patterns)  # (P, B)
    possible = jnp.swapaxes(possible, 0, 1)  # (B, P)
    P = patterns.shape[0]

    maximize = bool(getattr(criterion, "maximize", False))
    signed = -possible if maximize else possible
    loss = -gamma * (
        jax.scipy.special.logsumexp(-signed / gamma, axis=1) - jnp.log(P))
    if maximize:
        loss = -loss
    indices = jnp.argmin(signed, axis=1)

    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss, patterns[indices]


@dataclasses.dataclass(frozen=True)
class PIT:
    criterion: object
    n_sources: int

    def __post_init__(self):
        object.__setattr__(self, "patterns", permutation_table(self.n_sources))

    def __call__(self, input, target, batch_mean: bool = True):
        return pit(self.criterion, input, target, patterns=self.patterns, batch_mean=batch_mean)


class PIT1d(PIT):
    pass


class PIT2d(PIT):
    pass


@dataclasses.dataclass(frozen=True)
class ORPIT:
    criterion: object

    def __call__(self, input, target, n_sources=None, batch_mean: bool = True):
        return orpit(self.criterion, input, target, n_sources=n_sources, batch_mean=batch_mean)


@dataclasses.dataclass(frozen=True)
class ProbPIT:
    """Soft-min PIT marginalizing over all permutations (see `prob_pit`)."""

    criterion: object
    n_sources: int
    gamma: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "patterns", permutation_table(self.n_sources))

    def __call__(self, input, target, batch_mean: bool = True):
        return prob_pit(self.criterion, input, target, patterns=self.patterns,
                        gamma=self.gamma, batch_mean=batch_mean)


@dataclasses.dataclass(frozen=True)
class SinkPIT:
    criterion: object
    n_sources: int | None = None
    coldness: float = 1.0
    iteration: int = 10

    def __call__(self, input, target, batch_mean: bool = True):
        loss, P = sinkpit(self.criterion, input, target, n_sources=self.n_sources,
                          coldness=self.coldness, iteration=self.iteration, batch_mean=batch_mean)
        return loss, jnp.argmax(P, axis=2)
