"""Cepstrum analysis (real/complex) and minimum-phase reconstruction.

Capability parity: reference `src/transforms/cepstrum.py`.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def real_cepstrum(x, n_fft: int | None = None, eps: float = EPS):
    """(..., T) -> (..., n_fft) real cepstrum: irfft(log|FFT(x)|)."""
    n_fft = n_fft or x.shape[-1]
    spec = jnp.fft.rfft(x, n=n_fft)
    return jnp.fft.irfft(jnp.log(jnp.abs(spec) + eps), n=n_fft)


def complex_cepstrum(x, n_fft: int | None = None, eps: float = EPS):
    """Complex cepstrum via unwrapped-phase log spectrum."""
    n_fft = n_fft or x.shape[-1]
    spec = jnp.fft.fft(x, n=n_fft)
    log_spec = jnp.log(jnp.abs(spec) + eps) + 1j * jnp.unwrap(jnp.angle(spec))
    return jnp.fft.ifft(log_spec).real


def minimum_phase(x, n_fft: int | None = None, eps: float = EPS):
    """Minimum-phase signal with the same magnitude spectrum as x."""
    n_fft = n_fft or x.shape[-1]
    ceps = real_cepstrum(x, n_fft, eps)
    n = n_fft
    win = jnp.concatenate([
        jnp.ones((1,)), 2.0 * jnp.ones((n // 2 - 1,)),
        jnp.ones((1 if n % 2 == 0 else 2,)), jnp.zeros((n - n // 2 - 1,)),
    ])[:n]
    min_ceps = ceps * win
    spec = jnp.exp(jnp.fft.fft(min_ceps, n=n_fft))
    return jnp.fft.ifft(spec).real
