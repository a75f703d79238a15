"""Hungarian-assignment PIT — exact optimal matching in O(n^3).

The reference declares this but ships it unimplemented
(`src/criterion/hungarian.py:8-13` raises NotImplementedError); here it is
a full implementation — beyond-reference surface. Exhaustive PIT
(`criterion/pit.py`) evaluates all n! permutations, which is the right
call on TPU up to n ~ 5; past that the table explodes (8! = 40320
criterion sweeps). Hungarian PIT computes the same optimum from the
(B, n, n) pairwise loss matrix — n^2 criterion evaluations — and solves
the assignment with `optax.assignment.hungarian_algorithm` (pure JAX, so
it vmaps over the batch and stays inside jit).

Protocol matches `pit`: returns (loss, pattern) where pattern (B, n) is
the target permutation achieving the optimum; drop-in for PIT1d.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def hungarian_pit(criterion, input, target, batch_mean: bool = True):
    """Optimal-assignment PIT via the Hungarian algorithm.

    Args:
      input: (B, n, ...) estimates; target: (B, n, ...) references.
    Returns:
      (loss, pattern): loss () or (B,); pattern (B, n) with pattern[b, i]
      the target index matched to estimate i (same convention as `pit`).
    """
    from optax.assignment import hungarian_algorithm

    B, n = input.shape[0], input.shape[1]

    # Pairwise loss matrix C[b, i, j] = criterion(input_i, target_j),
    # built with one flattened criterion call (same shape trick as sinkpit).
    inp = jnp.repeat(input[:, :, None], n, axis=2)
    tgt = jnp.repeat(target[:, None, :], n, axis=1)
    flat_in = inp.reshape((-1,) + input.shape[2:])
    flat_tgt = tgt.reshape((-1,) + target.shape[2:])
    C = criterion(flat_in, flat_tgt, batch_mean=False).reshape(B, n, n)

    maximize = bool(getattr(criterion, "maximize", False))
    costs = -C if maximize else C

    def solve(c):
        rows, cols = hungarian_algorithm(c)
        perm = cols[jnp.argsort(rows)]  # pattern[i] = matched target of row i
        return perm, jnp.sum(c[jnp.arange(n), perm])

    pattern, total = jax.vmap(solve)(costs)
    loss = (-total if maximize else total) / n  # mean per source, like pit

    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss, pattern


@dataclasses.dataclass(frozen=True)
class HungarianLoss:
    """PIT via Hungarian assignment; use instead of PIT1d for large n."""

    criterion: object

    def __call__(self, input, target, batch_mean: bool = True):
        return hungarian_pit(self.criterion, input, target, batch_mean=batch_mean)
