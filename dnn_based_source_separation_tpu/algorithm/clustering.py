"""Batched clustering: KMeans / SoftKMeans / SphericalKMeans / GMM.

Capability parity: reference `src/algorithm/clustering.py:73-943` -- used by
DANet/ADANet/Wavesplit inference to turn embeddings into attractors.

TPU-first: all algorithms are batched over a leading batch axis with a FIXED
iteration count (jit-friendly; the reference also iterates a fixed count).
Assignments use one-hot matmuls instead of index scatters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def _kmeans_pp_init(key, data, n_clusters: int):
    """data: (n_samples, D) -> (n_clusters, D) kmeans++ seeding."""
    n_samples = data.shape[0]
    k0, key = jax.random.split(key)
    idx = jax.random.randint(k0, (), 0, n_samples)
    centroids = data[idx][None]  # (1, D)
    for _ in range(n_clusters - 1):
        d2 = jnp.min(
            jnp.sum((data[:, None] - centroids[None]) ** 2, axis=-1), axis=1
        )  # (n_samples,)
        kc, key = jax.random.split(key)
        probs = d2 / (jnp.sum(d2) + EPS)
        idx = jax.random.categorical(kc, jnp.log(probs + EPS))
        centroids = jnp.concatenate([centroids, data[idx][None]], axis=0)
    return centroids


class KMeans:
    """Batched hard KMeans. data: (B, n_samples, D)."""

    def __init__(self, n_clusters: int, init_centroids: str = "kmeans++", n_iterations: int = 10, seed: int = 0):
        self.n_clusters = n_clusters
        self.init_centroids = init_centroids
        self.n_iterations = n_iterations
        self.seed = seed

    def _init(self, key, data):
        if self.init_centroids == "kmeans++":
            return jax.vmap(lambda k, d: _kmeans_pp_init(k, d, self.n_clusters))(
                jax.random.split(key, data.shape[0]), data
            )
        n_samples = data.shape[1]
        idx = jax.vmap(
            lambda k: jax.random.choice(k, n_samples, (self.n_clusters,), replace=False)
        )(jax.random.split(key, data.shape[0]))
        return jnp.take_along_axis(data, idx[..., None], axis=1)

    def __call__(self, data, iteration: int | None = None):
        """Returns (assignments (B, n_samples), centroids (B, K, D))."""
        iteration = iteration or self.n_iterations
        key = jax.random.PRNGKey(self.seed)
        centroids = self._init(key, data)
        for _ in range(iteration):
            d2 = jnp.sum((data[:, :, None] - centroids[:, None]) ** 2, axis=-1)
            assign = jnp.argmin(d2, axis=-1)  # (B, n_samples)
            onehot = jax.nn.one_hot(assign, self.n_clusters, dtype=data.dtype)
            counts = jnp.sum(onehot, axis=1)  # (B, K)
            sums = jnp.einsum("bnk,bnd->bkd", onehot, data)
            new_centroids = sums / jnp.maximum(counts, 1.0)[..., None]
            centroids = jnp.where(counts[..., None] > 0, new_centroids, centroids)
        d2 = jnp.sum((data[:, :, None] - centroids[:, None]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=-1)
        return assign, centroids


class SoftKMeans(KMeans):
    """Soft assignments exp(-beta d^2) normalized (reference :170)."""

    def __init__(self, n_clusters: int, beta: float = 1.0, **kwargs):
        super().__init__(n_clusters, **kwargs)
        self.beta = beta

    def __call__(self, data, iteration: int | None = None):
        iteration = iteration or self.n_iterations
        key = jax.random.PRNGKey(self.seed)
        centroids = self._init(key, data)
        for _ in range(iteration):
            d2 = jnp.sum((data[:, :, None] - centroids[:, None]) ** 2, axis=-1)
            gamma = jax.nn.softmax(-self.beta * d2, axis=-1)  # (B, n, K)
            sums = jnp.einsum("bnk,bnd->bkd", gamma, data)
            centroids = sums / (jnp.sum(gamma, axis=1)[..., None] + EPS)
        d2 = jnp.sum((data[:, :, None] - centroids[:, None]) ** 2, axis=-1)
        gamma = jax.nn.softmax(-self.beta * d2, axis=-1)
        return gamma, centroids


class SphericalKMeans(KMeans):
    """Cosine-similarity KMeans on unit-normalized data (reference :285)."""

    def __call__(self, data, iteration: int | None = None):
        iteration = iteration or self.n_iterations
        data = data / (jnp.linalg.norm(data, axis=-1, keepdims=True) + EPS)
        key = jax.random.PRNGKey(self.seed)
        centroids = self._init(key, data)
        centroids = centroids / (jnp.linalg.norm(centroids, axis=-1, keepdims=True) + EPS)
        for _ in range(iteration):
            sim = jnp.einsum("bnd,bkd->bnk", data, centroids)
            assign = jnp.argmax(sim, axis=-1)
            onehot = jax.nn.one_hot(assign, self.n_clusters, dtype=data.dtype)
            sums = jnp.einsum("bnk,bnd->bkd", onehot, data)
            norm = jnp.linalg.norm(sums, axis=-1, keepdims=True)
            new_centroids = sums / (norm + EPS)
            counts = jnp.sum(onehot, axis=1)
            centroids = jnp.where(counts[..., None] > 0, new_centroids, centroids)
        sim = jnp.einsum("bnd,bkd->bnk", data, centroids)
        return jnp.argmax(sim, axis=-1), centroids


class GMMClustering:
    """Diagonal-covariance Gaussian mixture EM (reference GMMClustering:539)."""

    def __init__(self, n_clusters: int, n_iterations: int = 20, seed: int = 0):
        self.n_clusters = n_clusters
        self.n_iterations = n_iterations
        self.seed = seed

    def __call__(self, data, iteration: int | None = None):
        """data (B, n, D) -> (responsibilities (B, n, K), means (B, K, D))."""
        iteration = iteration or self.n_iterations
        B, n, D = data.shape
        K = self.n_clusters
        _, means = KMeans(K, n_iterations=5, seed=self.seed)(data)
        var = jnp.ones((B, K, D), data.dtype)
        pi = jnp.full((B, K), 1.0 / K, data.dtype)
        for _ in range(iteration):
            # E-step: log N(x | mu, diag var)
            diff2 = (data[:, :, None] - means[:, None]) ** 2  # (B, n, K, D)
            log_prob = -0.5 * jnp.sum(
                diff2 / (var[:, None] + EPS) + jnp.log(2 * jnp.pi * var[:, None] + EPS),
                axis=-1,
            )
            log_r = jnp.log(pi[:, None] + EPS) + log_prob
            r = jax.nn.softmax(log_r, axis=-1)  # (B, n, K)
            # M-step
            nk = jnp.sum(r, axis=1) + EPS  # (B, K)
            means = jnp.einsum("bnk,bnd->bkd", r, data) / nk[..., None]
            diff2 = (data[:, :, None] - means[:, None]) ** 2
            var = jnp.einsum("bnk,bnkd->bkd", r, diff2) / nk[..., None] + EPS
            pi = nk / n
        return r, means
