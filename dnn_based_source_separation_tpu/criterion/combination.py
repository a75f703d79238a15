"""Combination loss over all source-subset sums (X-UMX, MDX).

Capability parity: reference `src/criterion/combination.py:8-56`. The
reference's Python loop over `itertools.combinations` is replaced by a
precomputed (n_combos, n_sources) 0/1 subset matrix contracted with an
einsum, so every subset-sum is one batched matmul-friendly reduction.
"""
from __future__ import annotations

import dataclasses
import itertools

import jax.numpy as jnp
import numpy as np


def subset_matrix(n_sources: int, min_pair: int = 1, max_pair: int | None = None) -> np.ndarray:
    """(n_combos, n_sources) binary selection matrix over source subsets."""
    if max_pair is None:
        max_pair = n_sources - 1
    rows = []
    for k in range(min_pair, max_pair + 1):
        for combo in itertools.combinations(range(n_sources), k):
            row = np.zeros(n_sources, dtype=np.float32)
            row[list(combo)] = 1.0
            rows.append(row)
    return np.stack(rows)


@dataclasses.dataclass(frozen=True)
class CombinationLoss:
    criterion: object
    combination_dim: int = 1
    min_pair: int = 1
    max_pair: int | None = None

    def __call__(self, input, target, reduction: str = "mean", batch_mean: bool = True):
        """input/target: (B, n_sources, ...); returns reduced combo loss."""
        n = input.shape[self.combination_dim]
        M = jnp.asarray(subset_matrix(n, self.min_pair, self.max_pair))  # (K, n)

        x = jnp.moveaxis(input, self.combination_dim, 1)
        y = jnp.moveaxis(target, self.combination_dim, 1)
        # Subset sums: (B, K, ...) = sum_s M[k, s] * x[b, s, ...]
        x_sum = jnp.einsum("ks,bs...->bk...", M, x)
        y_sum = jnp.einsum("ks,bs...->bk...", M, y)

        K = x_sum.shape[1]
        losses = [
            self.criterion(x_sum[:, k], y_sum[:, k], batch_mean=batch_mean)
            for k in range(K)
        ]
        axis = 0 if batch_mean else 1
        loss = jnp.stack(losses, axis=axis)
        if reduction == "mean":
            loss = jnp.mean(loss, axis=axis)
        elif reduction == "sum":
            loss = jnp.sum(loss, axis=axis)
        return loss
