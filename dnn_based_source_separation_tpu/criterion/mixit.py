"""Mixture-invariant training (MixIT), Wisdom et al. 2020 (arXiv:2006.12701).

The reference declares this but ships it unimplemented
(`src/criterion/mixit.py:4-9` raises NotImplementedError); here it is a
full implementation — beyond-reference surface, built the same XLA-first
way as PIT (`criterion/pit.py`): the loop over source-to-mixture
assignments becomes a `vmap` over a precomputed (n_mix**n_est, n_est)
assignment table, and each candidate's per-mixture sums are one einsum
against the one-hot assignment matrix.

Protocol matches the PIT family: criteria are callables
`(input, target, batch_mean=False) -> (B,)` with a `maximize` attribute;
`mixit` returns `(loss, assignment)` where assignment (B, n_est) gives the
mixture index each estimated source was matched to.

The paper trains with thresholded SNR (`criterion.NegThresholdedSNR`),
which bounds the per-source loss so solved sources stop dominating.
Note a structural property of the objective (any criterion): assignments
that route EVERY estimate to one mixture leave the other an empty (zero)
sum scoring ~0 dB, which is a viable local optimum when the model can
memorize its training items — use enough mixture variety that
reconstructing one mixture exactly from the mixture-of-mixtures is
impossible, as in the paper's large-corpus setting.
"""
from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np


def mixture_assignment_table(n_est: int, n_mix: int = 2) -> np.ndarray:
    """(n_mix**n_est, n_est) int32 table: every way to route each of the
    n_est estimated sources to exactly one of the n_mix input mixtures."""
    return np.array(list(itertools.product(range(n_mix), repeat=n_est)),
                    dtype=np.int32)


def mixit(criterion, input, mixtures, table=None, batch_mean: bool = True):
    """Mixture-invariant loss.

    Args:
      input: (B, n_est, ...) estimated sources (n_est >= n_mix).
      mixtures: (B, n_mix, ...) reference mixtures (the model was fed their
        sum, the "mixture of mixtures").
      table: optional precomputed assignment table (see
        `mixture_assignment_table`).
    Returns:
      (loss, assignment): loss () or (B,); assignment (B, n_est) — the
      optimal mixture index per estimated source.
    """
    B, n_est = input.shape[0], input.shape[1]
    n_mix = mixtures.shape[1]
    if table is None:
        table = mixture_assignment_table(n_est, n_mix)
    table = jnp.asarray(table)
    onehot = jax.nn.one_hot(table, n_mix, dtype=input.dtype)  # (K, n_est, n_mix)

    def loss_for_assignment(assign):  # assign: (n_est, n_mix) one-hot
        est = jnp.einsum("mn,bm...->bn...", assign, input)  # (B, n_mix, ...)
        flat_est = est.reshape((B * n_mix,) + est.shape[2:])
        flat_mix = mixtures.reshape((B * n_mix,) + mixtures.shape[2:])
        losses = criterion(flat_est, flat_mix, batch_mean=False)
        return jnp.mean(losses.reshape(B, n_mix), axis=1)  # (B,)

    possible = jax.vmap(loss_for_assignment)(onehot)  # (K, B)
    possible = jnp.swapaxes(possible, 0, 1)  # (B, K)

    maximize = bool(getattr(criterion, "maximize", False))
    indices = jnp.argmax(possible, axis=1) if maximize else jnp.argmin(possible, axis=1)
    loss = jnp.take_along_axis(possible, indices[:, None], axis=1)[:, 0]

    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss, table[indices]


@dataclasses.dataclass(frozen=True)
class MixIT:
    """MixIT over a fixed (n_est, n_mix) geometry; table precomputed once.

    n_est is the model's output-source count, n_mix the number of reference
    mixtures summed into its input (2 in the paper's unsupervised recipe).
    """

    criterion: object
    n_est: int
    n_mix: int = 2

    def __post_init__(self):
        object.__setattr__(
            self, "table", mixture_assignment_table(self.n_est, self.n_mix))

    def __call__(self, input, mixtures, batch_mean: bool = True):
        return mixit(self.criterion, input, mixtures, table=self.table,
                     batch_mean=batch_mean)
