"""Deep-clustering affinity loss  ||V Vt - Y Yt||_F^2  (normalized form).

Capability parity: reference `src/criterion/deep_clustering.py:11-49`,
including the degree-normalization D = 1/sqrt(Y Yt 1) and optional binary
(threshold) weighting mask. arXiv:1508.04306.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class AffinityLoss:
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, binary_mask=None, batch_mean: bool = True):
        """input V: (B, n_samples, D1); target Y: (B, n_samples, D2) one-hot."""
        V, Y = input, target
        if binary_mask is not None:
            V = binary_mask[..., None] * V
            Y = binary_mask[..., None] * Y

        # Degree normalization: D_ii = 1/sqrt((Y Yt 1)_i)
        Ysum = jnp.sum(Y, axis=1, keepdims=True)  # (B, 1, D2)
        YY1 = jnp.sum(Y * Ysum, axis=2)  # (B, n_samples)
        D = 1.0 / jnp.sqrt(YY1 + self.eps)

        VD = jnp.swapaxes(V, 1, 2) * D[:, None, :]  # (B, D1, n)
        YD = jnp.swapaxes(Y, 1, 2) * D[:, None, :]  # (B, D2, n)
        VDV = jnp.matmul(VD, V)
        YDY = jnp.matmul(YD, Y)
        VDY = jnp.matmul(VD, Y)

        loss = (
            jnp.sum(jnp.square(VDV), axis=(1, 2))
            + jnp.sum(jnp.square(YDY), axis=(1, 2))
            - 2.0 * jnp.sum(jnp.square(VDY), axis=(1, 2))
        )
        if batch_mean:
            loss = jnp.mean(loss, axis=0)
        return loss
