"""Griffin-Lim phase reconstruction (+ fast/momentum variant).

Capability parity: reference `src/algorithm/griffin_lim.py:8-121`
(GriffinLim, FastGriffinLim). Pure jnp; a fixed iteration count keeps the
loop unrollable/compilable under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import istft, stft


def _project(amplitude, phase_spec, n_fft, hop_length, window, length):
    """Enforce the magnitude, resynthesize, and re-analyze."""
    spec = amplitude * jnp.exp(1j * jnp.angle(phase_spec))
    x = istft(spec, n_fft, hop_length, window=window, length=length)
    return stft(x, n_fft, hop_length, window=window)


def griffin_lim(
    amplitude,
    n_fft: int,
    hop_length: int | None = None,
    window=None,
    iteration: int = 100,
    length: int | None = None,
    init_phase=None,
    key=None,
):
    """amplitude: (..., n_bins, n_frames) -> waveform (..., T)."""
    hop_length = hop_length or n_fft // 4
    if init_phase is None:
        if key is not None:
            init_phase = 2 * jnp.pi * jax.random.uniform(key, amplitude.shape)
        else:
            init_phase = jnp.zeros_like(amplitude)
    spec = amplitude * jnp.exp(1j * init_phase)
    for _ in range(iteration):
        spec = _project(amplitude, spec, n_fft, hop_length, window, length)
    spec = amplitude * jnp.exp(1j * jnp.angle(spec))
    return istft(spec, n_fft, hop_length, window=window, length=length)


def fast_griffin_lim(
    amplitude,
    n_fft: int,
    hop_length: int | None = None,
    window=None,
    iteration: int = 100,
    alpha: float = 0.99,
    length: int | None = None,
    init_phase=None,
    key=None,
):
    """Momentum-accelerated Griffin-Lim (reference FastGriffinLim:75)."""
    hop_length = hop_length or n_fft // 4
    if init_phase is None:
        if key is not None:
            init_phase = 2 * jnp.pi * jax.random.uniform(key, amplitude.shape)
        else:
            init_phase = jnp.zeros_like(amplitude)
    spec = amplitude * jnp.exp(1j * init_phase)
    prev = spec
    for _ in range(iteration):
        proj = _project(amplitude, spec + alpha * (spec - prev), n_fft, hop_length, window, length)
        prev, spec = spec, proj
    spec = amplitude * jnp.exp(1j * jnp.angle(spec))
    return istft(spec, n_fft, hop_length, window=window, length=length)


class GriffinLim:
    """Object API mirroring the reference module classes."""

    def __init__(self, n_fft, hop_length=None, window=None, iteration=100):
        self.n_fft, self.hop_length = n_fft, hop_length or n_fft // 4
        self.window, self.iteration = window, iteration

    def __call__(self, amplitude, length=None, **kwargs):
        return griffin_lim(
            amplitude, self.n_fft, self.hop_length, window=self.window,
            iteration=self.iteration, length=length, **kwargs,
        )


class FastGriffinLim(GriffinLim):
    def __init__(self, n_fft, hop_length=None, window=None, iteration=100, alpha=0.99):
        super().__init__(n_fft, hop_length, window, iteration)
        self.alpha = alpha

    def __call__(self, amplitude, length=None, **kwargs):
        return fast_griffin_lim(
            amplitude, self.n_fft, self.hop_length, window=self.window,
            iteration=self.iteration, alpha=self.alpha, length=length, **kwargs,
        )
