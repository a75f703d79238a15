"""Principal component analysis.

Capability parity: reference `src/transforms/pca.py`.
"""
from __future__ import annotations

import jax.numpy as jnp


def pca(x, n_components: int | None = None, center: bool = True):
    """x: (n_samples, n_features) -> (projected, components, explained_var)."""
    if center:
        x = x - jnp.mean(x, axis=0, keepdims=True)
    cov = x.T @ x / (x.shape[0] - 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    order = jnp.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    if n_components is not None:
        eigvals, eigvecs = eigvals[:n_components], eigvecs[:, :n_components]
    return x @ eigvecs, eigvecs, eigvals
