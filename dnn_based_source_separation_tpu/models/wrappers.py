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


@register_model
class WaveChannelAdapter(nn.Module, SeparationModelMixin):
    """(B, 1, C, T) mixture -> time-domain base model over (B, C, T).

    Adapts the musdb18 loaders (leading singleton "mixture" axis, reference
    adhoc_dataset.py item shape (1, n_mics, T)) to time-domain models whose
    forward is (B, C_in, T) -> (B, n_src, C, T) or (B, n_src, T): ConvTasNet
    with in_channels=2 (reference egs/musdb18/conv-tasnet/local/train.py:103)
    or MultiResolutionCrossNet.
    """

    base: nn.Module

    @nn.compact
    def __call__(self, mixture, train: bool = False):
        return self.base(mixture[:, 0], train=train)


@register_model
class MonoWaveAdapter(nn.Module, SeparationModelMixin):
    """(B, 1, C, T) -> mono downmix -> base (B, 1, T) -> (B, n_src, T).

    For the Meta-TasNet recipe: the reference cascade operates on mono
    resampled waveforms (egs/musdb18/meta-tasnet/train.sh); targets must be
    downmixed the same way (criterion.spectral.MonoTargetAdapter).
    """

    base: nn.Module

    @nn.compact
    def __call__(self, mixture, train: bool = False):
        mono = jnp.mean(mixture[:, 0], axis=1, keepdims=True)  # (B, 1, T)
        return self.base(mono)


@register_model
class SingleStemSpectrogramWrapper(nn.Module, SeparationModelMixin):
    """(B, 1, C, T) wave -> (B, 1, C, F, S) masked magnitude for ONE stem.

    Per-target spectrogram models (HRNet, reference egs/musdb18/hrnet
    target='vocals'): base consumes (B, C, F, S) amplitude and returns the
    masked amplitude of the single target.
    """

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
        y = self.base(amp[:, 0], train=train)
        return y[:, None]


@register_model
class ConditionedSpectrogramWrapper(nn.Module, SeparationModelMixin):
    """FiLM-conditioned U-Net over ALL stem conditions in one batched pass.

    The reference CUNet recipe trains by sampling one conditioning one-hot
    per example (egs/musdb18/cunet/train.sh); here every example is run under
    all n_sources one-hots inside a single (B*n_src) batched forward -- same
    expected gradient, deterministic, and it keeps the MXU fed. Inference
    gets all stems in one call, which is exactly what the Evaluater needs.
    """

    base: nn.Module
    n_fft: int
    hop_length: Optional[int] = None
    window_fn: str = "hann"
    n_sources: int = 4

    @nn.compact
    def __call__(self, mixture, train: bool = False):
        hop = self.hop_length or self.n_fft // 4
        window = build_window(self.n_fft, self.window_fn)
        spec = stft(mixture, self.n_fft, hop, window=window)
        amp = jnp.abs(spec)[:, 0]  # (B, C, F, S)
        B, C, F, S = amp.shape
        n = self.n_sources
        xb = jnp.tile(amp[None], (n, 1, 1, 1, 1)).reshape(n * B, C, F, S)
        latent = jnp.repeat(jnp.eye(n, dtype=amp.dtype), B, axis=0)  # (n*B, n)
        y = self.base(xb, latent, train=train)  # (n*B, C, F, S)
        return jnp.moveaxis(y.reshape(n, B, C, F, S), 0, 1)  # (B, n, C, F, S)
