"""MISI: multiple input spectrogram inversion (joint phase reconstruction).

Capability parity: reference `src/algorithm/misi.py:13` -- given source
amplitude spectrograms and the time-domain mixture, iteratively distribute
the mixture residual across sources before re-projecting phases.
Gunawan & Sen, 2010.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.stft import istft, stft


def misi(
    amplitudes,
    mixture,
    n_fft: int,
    hop_length: int | None = None,
    window=None,
    iteration: int = 10,
):
    """amplitudes: (n_src, ..., F, T'); mixture: (..., T) -> (n_src, ..., T)."""
    hop_length = hop_length or n_fft // 4
    n_sources = amplitudes.shape[0]
    T = mixture.shape[-1]
    spec = amplitudes * jnp.exp(1j * jnp.zeros_like(amplitudes))
    estimates = istft(spec, n_fft, hop_length, window=window, length=T)
    for _ in range(iteration):
        error = mixture - jnp.sum(estimates, axis=0)
        corrected = estimates + error / n_sources
        spec = stft(corrected, n_fft, hop_length, window=window)
        spec = amplitudes * jnp.exp(1j * jnp.angle(spec))
        estimates = istft(spec, n_fft, hop_length, window=window, length=T)
    return estimates


class MISI:
    def __init__(self, n_fft, hop_length=None, window=None, iteration=10):
        self.n_fft, self.hop_length = n_fft, hop_length or n_fft // 4
        self.window, self.iteration = window, iteration

    def __call__(self, amplitudes, mixture):
        return misi(
            amplitudes, mixture, self.n_fft, self.hop_length,
            window=self.window, iteration=self.iteration,
        )
