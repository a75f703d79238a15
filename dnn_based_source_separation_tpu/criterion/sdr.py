"""SDR-family criteria: SDR, SI-SDR, clipped SI-SDR, weighted SDR.

Capability parity: reference `src/criterion/sdr.py:6-476`. Pure jnp; every
class is a lightweight dataclass implementing the reference call protocol
`(input, target, batch_mean=True)` with a `maximize` attribute for PIT.

Shapes: (B, T), (B, n_sources, T) or (B, n_sources, n_mics, T); the metric
reduces the last axis, `reduction` averages/sums the middle dims.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

EPS = 1e-12


def sdr(input, target, eps: float = EPS):
    """Source-to-distortion ratio in dB over the last axis."""
    num = jnp.sum(jnp.square(target), axis=-1) + eps
    den = jnp.sum(jnp.square(target - input), axis=-1) + eps
    return 10.0 * jnp.log10(num / den)


def sisdr(input, target, eps: float = EPS):
    """Scale-invariant SDR ("SDR - half-baked or well done?", arXiv:1811.02508)."""
    alpha = jnp.sum(input * target, axis=-1, keepdims=True) / (
        jnp.sum(jnp.square(target), axis=-1, keepdims=True) + eps
    )
    num = jnp.sum(jnp.square(alpha * target), axis=-1) + eps
    den = jnp.sum(jnp.square(alpha * target - input), axis=-1) + eps
    return 10.0 * jnp.log10(num / den)


def thresholded_snr(input, target, threshold_db: float = 30.0, eps: float = EPS):
    """Soft-thresholded SNR in dB (MixIT paper, arXiv:2006.12701 eq. 2):

        10*log10(||t||^2 / (||t - e||^2 + tau*||t||^2)),  tau = 10^(-thr/10)

    The tau*||t||^2 term caps the achievable SNR at threshold_db, bounding
    the loss (and its gradient) as reconstruction becomes near-perfect so
    already-solved sources stop dominating training — the paper's stated
    reason for thresholding. A zero estimate scores ~0 dB (as with
    eps-guarded SI-SDR); the threshold changes the top of the range,
    not the bottom.
    """
    tau = 10.0 ** (-threshold_db / 10.0)
    t_pow = jnp.sum(jnp.square(target), axis=-1)
    err = jnp.sum(jnp.square(target - input), axis=-1)
    return 10.0 * jnp.log10((t_pow + eps) / (err + tau * t_pow + eps))


def weighted_sdr(input, target, source_dim: int = 1, eps: float = EPS):
    """Weighted SDR ("Phase-Aware Speech Enhancement with Deep Complex U-Net").

    rho-weighted cosine similarity between (target, input) and the residual
    pair (mixture-target, mixture-input); mixture = sum of targets.
    """
    mixture = jnp.sum(target, axis=source_dim, keepdims=True)
    target_power = jnp.sum(jnp.square(target), axis=-1)
    cos = (jnp.sum(target * input, axis=-1) + eps) / (
        jnp.linalg.norm(target, axis=-1) * jnp.linalg.norm(input, axis=-1) + eps
    )
    res_in, res_tgt = mixture - input, mixture - target
    res_power = jnp.sum(jnp.square(res_tgt), axis=-1)
    cos_res = (jnp.sum(res_tgt * res_in, axis=-1) + eps) / (
        jnp.linalg.norm(res_tgt, axis=-1) * jnp.linalg.norm(res_in, axis=-1) + eps
    )
    rho = (target_power + eps) / (target_power + res_power + eps)
    return rho * cos + (1.0 - rho) * cos_res


def _reduce(loss, reduction: str | None, batch_mean: bool):
    """Apply the reference reduction protocol: middle dims then batch dim."""
    if reduction and loss.ndim > 1:
        axes = tuple(range(1, loss.ndim))
        loss = jnp.mean(loss, axis=axes) if reduction == "mean" else jnp.sum(loss, axis=axes)
    if batch_mean:
        loss = jnp.mean(loss, axis=0)
    return loss


@dataclasses.dataclass(frozen=True)
class SDR:
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=True, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        return _reduce(sdr(input, target, eps=self.eps), self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class NegSDR:
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        return _reduce(-sdr(input, target, eps=self.eps), self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class SISDR:
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=True, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        return _reduce(sisdr(input, target, eps=self.eps), self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class NegSISDR:
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        return _reduce(-sisdr(input, target, eps=self.eps), self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class ClippedSISDR:
    """SI-SDR clamped from above (reference `src/criterion/sdr.py:233`)."""

    max: float | None = None
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=True, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = sisdr(input, target, eps=self.eps)
        if self.max is not None:
            loss = jnp.minimum(loss, self.max)
        return _reduce(loss, self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class NegThresholdedSNR:
    """MixIT's training loss (see `thresholded_snr`)."""

    threshold_db: float = 30.0
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = -thresholded_snr(input, target, threshold_db=self.threshold_db,
                                eps=self.eps)
        return _reduce(loss, self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class WeightedSDR:
    source_dim: int = 1
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=True, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = weighted_sdr(input, target, source_dim=self.source_dim, eps=self.eps)
        return _reduce(loss, self.reduction, batch_mean)


@dataclasses.dataclass(frozen=True)
class NegWeightedSDR:
    source_dim: int = 1
    reduction: str | None = "mean"
    eps: float = EPS
    maximize: bool = dataclasses.field(default=False, init=False)

    def __call__(self, input, target, batch_mean: bool = True):
        loss = -weighted_sdr(input, target, source_dim=self.source_dim, eps=self.eps)
        return _reduce(loss, self.reduction, batch_mean)
