"""NMF with EUC / KL / IS multiplicative updates.

Capability parity: reference `src/algorithm/nmf.py:9-166` (NMF class with
divergence-selected multiplicative updates on V ~ W H).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


class NMF:
    """V (F, T) nonnegative -> basis W (F, K), activation H (K, T)."""

    def __init__(self, n_basis: int, divergence: str = "EUC", n_iterations: int = 100, seed: int = 0):
        if divergence not in ("EUC", "KL", "IS"):
            raise ValueError(f"Unsupported divergence: {divergence}")
        self.n_basis = n_basis
        self.divergence = divergence
        self.n_iterations = n_iterations
        self.seed = seed

    def __call__(self, target, iteration: int | None = None):
        iteration = iteration or self.n_iterations
        F, T = target.shape
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
        W = jax.random.uniform(k1, (F, self.n_basis), minval=0.1, maxval=1.0)
        H = jax.random.uniform(k2, (self.n_basis, T), minval=0.1, maxval=1.0)
        V = target

        for _ in range(iteration):
            WH = W @ H + EPS
            if self.divergence == "EUC":
                W = W * (V @ H.T) / (WH @ H.T + EPS)
                WH = W @ H + EPS
                H = H * (W.T @ V) / (W.T @ WH + EPS)
            elif self.divergence == "KL":
                W = W * ((V / WH) @ H.T) / (jnp.sum(H, axis=1)[None, :] + EPS)
                WH = W @ H + EPS
                H = H * (W.T @ (V / WH)) / (jnp.sum(W, axis=0)[:, None] + EPS)
            else:  # IS
                W = W * jnp.sqrt(((V / WH**2) @ H.T) / ((1.0 / WH) @ H.T + EPS))
                WH = W @ H + EPS
                H = H * jnp.sqrt((W.T @ (V / WH**2)) / (W.T @ (1.0 / WH) + EPS))
        self.basis, self.activation = W, H
        return W, H

    def reconstruct(self):
        return self.basis @ self.activation
