"""Waveform<->spectrogram wrapper modules for spectrogram-domain models.

TPU-first counterpart of the reference's dataset-side STFT
(`egs/musdb18/common/src/dataset.py:322-388`): the STFT/|.| runs ON DEVICE
inside the jitted train step, so loaders ship raw waveforms and the whole
transform+model+loss is one compiled program.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.stft import stft
from ..ops.windows import build_window
from .base import SeparationModelMixin, register_model


@register_model
class SpectrogramMaskingWrapper(nn.Module, SeparationModelMixin):
    """(B, 1, C, T) mixture wave -> base model magnitudes (B, n_src, C, F, S)."""

    base: nn.Module
    n_fft: int
    hop_length: Optional[int] = None
    window_fn: str = "hann"

    @nn.compact
    def __call__(self, mixture, train: bool = False):
        hop = self.hop_length or self.n_fft // 4
        window = build_window(self.n_fft, self.window_fn)
        spec = stft(mixture, self.n_fft, hop, window=window)  # (B, 1, C, F, S)
        amp = jnp.abs(spec)
        return self.base(amp, train=train)
