"""Adapters comparing spectral estimates against waveform targets on device."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..ops.stft import stft
from ..ops.windows import build_window


@dataclasses.dataclass(frozen=True)
class SpectralTargetAdapter:
    """Wrap a spectral criterion so targets may arrive as waveforms.

    __call__(estimates_spec, target_waves (B, n_src, C, T)): computes the
    target STFT on device and forwards (est, target_spec) to the base
    criterion (complex target if complex_target else magnitudes).
    """

    base: object
    n_fft: int
    hop_length: Optional[int] = None
    window_fn: str = "hann"
    complex_target: bool = False

    @property
    def maximize(self):
        return bool(getattr(self.base, "maximize", False))

    def __call__(self, estimates, target_waves, batch_mean: bool = True):
        hop = self.hop_length or self.n_fft // 4
        window = build_window(self.n_fft, self.window_fn)
        tgt = stft(target_waves, self.n_fft, hop, window=window)
        if not self.complex_target:
            tgt = jnp.abs(tgt)
        return self.base(estimates, tgt, batch_mean=batch_mean)


@dataclasses.dataclass(frozen=True)
class MonoTargetAdapter:
    """Downmix (B, n_src, C, T) waveform targets to mono before the base
    criterion (Meta-TasNet recipe: the reference cascade is mono)."""

    base: object

    @property
    def maximize(self):
        return bool(getattr(self.base, "maximize", False))

    def __call__(self, estimates, target_waves, batch_mean: bool = True):
        tgt = jnp.mean(target_waves, axis=2)
        return self.base(estimates, tgt, batch_mean=batch_mean)
