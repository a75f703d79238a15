"""X-UMX multi-domain loss: time-domain wSDR + frequency MSE over source
combinations.

Capability parity: reference `egs/musdb18/x-umx/src/adhoc_criterion.py:9-80`
(MultiDomainLoss): input is the estimated AMPLITUDE spectrogram; target is
the COMPLEX spectrogram. Phase for the time-domain branch is taken from the
re-mixed target; both branches run through CombinationLoss over source
subsets. All STFT round trips happen on device inside the jitted loss.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from ..ops.stft import istft, stft
from .combination import CombinationLoss
from .distance import MSELoss
from .sdr import NegWeightedSDR


@dataclasses.dataclass(frozen=True)
class MultiDomainLoss:
    n_fft: int
    hop_length: int
    window: object = None
    weight_time: float = 10.0
    weight_frequency: float = 1.0
    combination: bool = True
    source_dim: int = 1
    min_pair: int = 1
    max_pair: Optional[int] = None
    maximize: bool = dataclasses.field(default=False, init=False)

    def __post_init__(self):
        ct = NegWeightedSDR(reduction="mean")
        cf = MSELoss(dim=(-2, -1))
        if self.combination:
            ct = CombinationLoss(ct, combination_dim=self.source_dim,
                                 min_pair=self.min_pair, max_pair=self.max_pair)
            cf = CombinationLoss(cf, combination_dim=self.source_dim,
                                 min_pair=self.min_pair, max_pair=self.max_pair)
        object.__setattr__(self, "_criterion_time", ct)
        object.__setattr__(self, "_criterion_frequency", cf)

    def __call__(self, input, target, batch_mean: bool = True):
        """input: real (B, n_src, C, F, S); target: complex same shape."""
        assert not jnp.iscomplexobj(input), "input should be real."
        assert jnp.iscomplexobj(target), "target should be complex."

        target_amplitude = jnp.abs(target)
        target_time = istft(target, self.n_fft, self.hop_length, window=self.window)
        mixture_time = jnp.sum(target_time, axis=1, keepdims=True)
        mixture = stft(mixture_time, self.n_fft, self.hop_length, window=self.window)
        mixture_phase = jnp.angle(mixture)

        est_complex = input * jnp.exp(1j * mixture_phase)
        input_time = istft(est_complex, self.n_fft, self.hop_length, window=self.window)

        loss_time = 0.0
        if self.weight_time != 0:
            loss_time = self._criterion_time(input_time, target_time, batch_mean=batch_mean)
        loss_frequency = 0.0
        if self.weight_frequency != 0:
            loss_frequency = self._criterion_frequency(input, target_amplitude, batch_mean=batch_mean)
        return self.weight_time * loss_time + self.weight_frequency * loss_frequency
