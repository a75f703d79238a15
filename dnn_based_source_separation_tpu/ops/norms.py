"""TasNet normalization primitives: global LN and cumulative (causal) LN.

Capability parity: reference `src/modules/norm.py:11-116` (`GlobalLayerNorm`,
`CumulativeLayerNorm1d`). TPU-first: channels-last (..., T, N); cLN's
running statistics map to a single `jnp.cumsum` over the frame axis (the
reference computes the same cumulative sums, torch-side).
"""
from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def global_layer_norm(x, gamma, beta, eps: float = 1e-8):
    """Normalize over (T, N) jointly per sample. x: (..., T, N).

    custom_vjp: the hand-derived fused backward replaces autodiff's chain
    of mean/var/rsqrt gradients (which materializes several full-size
    intermediates — HBM traffic the TDCN backward pass is bound by) with
    one pass: dx = rstd * (g - mean(g) - xhat * mean(g*xhat)), g = dy*gamma.
    Residuals are (xhat, rstd, gamma) — no extra full tensors beyond what
    autodiff would save.
    """
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
    return gamma * (x - mean) / jnp.sqrt(var + eps) + beta


def _gln_fwd(x, gamma, beta, eps):
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
    rstd = 1.0 / jnp.sqrt(var + eps)
    xhat = (x - mean) * rstd
    return gamma * xhat + beta, (xhat, rstd, gamma)


def _gln_bwd(eps, res, dy):
    xhat, rstd, gamma = res
    g = dy * gamma
    m1 = jnp.mean(g, axis=(-2, -1), keepdims=True)
    m2 = jnp.mean(g * xhat, axis=(-2, -1), keepdims=True)
    dx = rstd * (g - m1 - xhat * m2)
    red = tuple(range(dy.ndim - 1))
    dgamma = jnp.sum(dy * xhat, axis=red)
    dbeta = jnp.sum(dy, axis=red)
    return dx, dgamma, dbeta


global_layer_norm.defvjp(_gln_fwd, _gln_bwd)


def cumulative_layer_norm(x, gamma, beta, eps: float = 1e-8):
    """Causal layer norm: stats over channels and all frames <= t.

    x: (..., T, N); gamma/beta: (N,).
    """
    N = x.shape[-1]
    t_count = jnp.arange(1, x.shape[-2] + 1, dtype=x.dtype)[:, None] * N  # (T,1)
    cum_sum = jnp.cumsum(jnp.sum(x, axis=-1, keepdims=True), axis=-2)
    cum_sq = jnp.cumsum(jnp.sum(jnp.square(x), axis=-1, keepdims=True), axis=-2)
    mean = cum_sum / t_count
    var = cum_sq / t_count - jnp.square(mean)
    return gamma * (x - mean) / jnp.sqrt(var + eps) + beta


class GlobalLayerNorm(nn.Module):
    """gLN over (T, N) for channels-last inputs (..., T, N).

    `affine=False` is the inference-time "folded" mode (models/fold.py):
    gamma/beta are still declared (checkpoint-compatible pytree) but the
    per-element affine pass is skipped — the fold transform has already
    multiplied gamma into the adjacent conv/matmul weights and absorbed
    beta into its bias. When a `pad` is requested in folded mode, the
    frame padding is filled with -beta/gamma instead of zeros so that the
    folded convolution over the padded frames reproduces the unfolded
    zero-padded-after-affine result exactly (gamma*p + beta = 0).
    """

    features: int
    eps: float = 1e-8
    affine: bool = True

    @nn.compact
    def __call__(self, x, pad: tuple = (0, 0)):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        pl, pr = pad
        if self.affine:
            y = global_layer_norm(x, gamma, beta, self.eps)
            if pl or pr:
                y = jnp.pad(y, ((0, 0),) * (y.ndim - 2) + ((pl, pr), (0, 0)))
            return y
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if pl or pr:
            # gamma == 0 would make the folded kernel column zero anyway,
            # so the fill value is irrelevant there; avoid the division.
            fill = jnp.where(gamma == 0, 0.0, -beta / jnp.where(gamma == 0, 1.0, gamma))
            fill = fill.astype(y.dtype)
            parts = []
            if pl:
                parts.append(jnp.broadcast_to(fill, y.shape[:-2] + (pl, self.features)))
            parts.append(y)
            if pr:
                parts.append(jnp.broadcast_to(fill, y.shape[:-2] + (pr, self.features)))
            y = jnp.concatenate(parts, axis=-2)
        return y


class CumulativeLayerNorm(nn.Module):
    """Causal cLN for channels-last inputs (..., T, N).

    Exact streaming: when applied with the 'stream' collection mutable
    (`model.apply(vars, x, mutable=['stream'])`), the running (count, sum,
    sum-of-squares) persist across calls, so chunk-by-chunk application
    reproduces the offline cumulative statistics EXACTLY — the piece the
    windowed streaming wrapper could only approximate (models/streaming.py).
    Offline applies (no mutable 'stream') are untouched.
    """

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        if not self.is_mutable_collection("stream") or self.is_initializing():
            return cumulative_layer_norm(x, gamma, beta, self.eps)

        # Carried stats: (..., 1, 3) = [frame count, sum, sum of squares]
        # per batch element; zeros == stream start, matching offline.
        stats = self.variable(
            "stream", "stats",
            lambda: jnp.zeros(x.shape[:-2] + (1, 3), jnp.float32))
        if x.shape[-2] == 0:  # drain call: nothing to normalize or accumulate
            return x
        t0, s0, q0 = (stats.value[..., 0], stats.value[..., 1],
                      stats.value[..., 2])
        N = x.shape[-1]
        xf = x.astype(jnp.float32)
        t_idx = jnp.arange(1, x.shape[-2] + 1, dtype=jnp.float32)[:, None]
        t_count = (t0[..., None] + t_idx) * N  # (..., T, 1)
        cum_sum = s0[..., None] + jnp.cumsum(
            jnp.sum(xf, axis=-1, keepdims=True), axis=-2)
        cum_sq = q0[..., None] + jnp.cumsum(
            jnp.sum(jnp.square(xf), axis=-1, keepdims=True), axis=-2)
        mean = cum_sum / t_count
        var = cum_sq / t_count - jnp.square(mean)
        out = gamma * (x - mean.astype(x.dtype)) / jnp.sqrt(
            var + self.eps).astype(x.dtype) + beta
        stats.value = jnp.concatenate(
            [t0 + x.shape[-2], cum_sum[..., -1, :], cum_sq[..., -1, :]],
            axis=-1)[..., None, :]
        return out


class ChannelLayerNorm(nn.Module):
    """Per-frame LayerNorm over channels only (UMX/dual-path style)."""

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.features,))
        beta = self.param("beta", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


def choose_layer_norm(kind: str, features: int, causal: bool = False, eps: float = 1e-8,
                      affine: bool = True):
    """Factory mirroring reference `src/utils/tasnet.py:14` (choose_layer_norm).

    `affine=False` (folded-inference mode, models/fold.py) is only defined
    for gLN — the causal/cumulative norms keep their affine.
    """
    if kind in ("cLN",) or causal:
        if not affine:
            raise ValueError("affine folding is only supported for gLN")
        return CumulativeLayerNorm(features, eps=eps)
    if kind in ("gLN", "global"):
        return GlobalLayerNorm(features, eps=eps, affine=affine)
    if kind in ("LN", "layer", "channel"):
        if not affine:
            raise ValueError("affine folding is only supported for gLN")
        return ChannelLayerNorm(features, eps=eps)
    raise ValueError(f"Unsupported layer norm: {kind}")
