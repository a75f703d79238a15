"""MMDenseNet: multi-band multi-scale DenseNet (+ parallel per-stem wrapper).

Capability parity: reference `src/models/mm_densenet.py` (MMDenseNet:141,
ParallelMMDenseNet:22, MMDenseNetTimeDomainWrapper:434) with BandSplit from
`src/models/transform.py:67`. Per-band MDenseNet backbones (low/middle/...)
plus a full-band backbone; band outputs concatenate along bins, full-band
output concatenates along channels, and a final dense block + BN + GLU2d
emits the mask-like output.

Band configs are dicts keyed by band name (and 'full'), exactly like the
reference YAML (`egs/musdb18/mm-densenet` style).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.stft import istft, stft
from ..ops.windows import build_window
from .base import SeparationModelMixin, register_model
from .m_densenet import EPS, DenseBlock, GLU2d, MDenseNetBackbone

FULL = "full"


@register_model
class MMDenseNet(nn.Module, SeparationModelMixin):
    """(B, in_channels, n_bins, n_frames) amplitude -> same shape."""

    in_channels: int
    num_features: Any
    growth_rate: Any
    kernel_size: Any
    bands: Sequence[str] = ("low", "middle")
    sections: Sequence[int] = (512, 513)
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    kernel_size_final: Any = None
    dilated_final: Any = False
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    depth_final: Any = None
    eps: float = EPS

    def _band_cfg(self, cfg, band):
        import collections.abc

        if isinstance(cfg, collections.abc.Mapping):  # dict or flax FrozenDict
            return cfg[band]
        return cfg

    @nn.compact
    def __call__(self, input, train: bool = False):
        B, C, n_bins, n_frames = input.shape
        bands, sections = list(self.bands), list(self.sections)
        total = sum(sections)

        if total == n_bins:
            x_valid, x_invalid = input, None
        else:
            x_valid, x_invalid = input[:, :, :total], input[:, :, total:]

        scale_in = self.param("scale_in", nn.initializers.ones, (total,))
        bias_in = self.param("bias_in", nn.initializers.zeros, (total,))
        scale_out = self.param("scale_out", nn.initializers.ones, (total,))
        bias_out = self.param("bias_out", nn.initializers.zeros, (total,))

        x = (x_valid - bias_in[:, None]) / (jnp.abs(scale_in[:, None]) + self.eps)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC

        out_channels = max(self._band_cfg(self.growth_rate, b)[-1] for b in bands)

        # Per-band backbones over bin sections.
        offsets = [0]
        for s in sections:
            offsets.append(offsets[-1] + s)
        band_outs = []
        for idx, band in enumerate(bands):
            xb = x[:, offsets[idx] : offsets[idx + 1]]
            gr = self._band_cfg(self.growth_rate, band)
            extra = out_channels if gr[-1] < out_channels else None
            yb = MDenseNetBackbone(
                self._band_cfg(self.num_features, band), gr,
                self._band_cfg(self.kernel_size, band),
                scale=self._band_cfg(self.scale, band),
                dilated=self._band_cfg(self.dilated, band),
                norm=self._band_cfg(self.norm, band),
                nonlinear=self._band_cfg(self.nonlinear, band),
                depth=self._band_cfg(self.depth, band),
                out_channels=extra, eps=self.eps, name=f"net_{band}",
            )(xb, train=train)
            band_outs.append(yb)
        x_bands = jnp.concatenate(band_outs, axis=1)  # concat along bins

        x_full = MDenseNetBackbone(
            self._band_cfg(self.num_features, FULL),
            self._band_cfg(self.growth_rate, FULL),
            self._band_cfg(self.kernel_size, FULL),
            scale=self._band_cfg(self.scale, FULL),
            dilated=self._band_cfg(self.dilated, FULL),
            norm=self._band_cfg(self.norm, FULL),
            nonlinear=self._band_cfg(self.nonlinear, FULL),
            depth=self._band_cfg(self.depth, FULL),
            eps=self.eps, name=f"net_{FULL}",
        )(x, train=train)

        h = jnp.concatenate([x_bands, x_full], axis=-1)  # concat channels
        h = DenseBlock(
            self.growth_rate_final, self.kernel_size_final or self.kernel_size,
            depth=self.depth_final, dilated=self.dilated_final,
            norm=self.norm_final, nonlinear=self.nonlinear_final,
            eps=self.eps, name="dense_block",
        )(h, train=train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm2d")(h)
        h = GLU2d(C, name="glu2d")(h)
        h = jnp.transpose(h, (0, 3, 1, 2))
        h = scale_out[:, None] * h + bias_out[:, None]
        h = nn.relu(h)

        dh = h.shape[2] - total
        dw = h.shape[3] - n_frames
        h = h[:, :, dh // 2 : h.shape[2] - (dh - dh // 2), dw // 2 : h.shape[3] - (dw - dw // 2)]
        if x_invalid is None:
            return h
        return jnp.concatenate([h, x_invalid], axis=2)


@register_model
class ParallelMMDenseNet(nn.Module, SeparationModelMixin):
    """One MMDenseNet per stem (reference ParallelMMDenseNet:22)."""

    in_channels: int
    num_features: Any
    growth_rate: Any
    kernel_size: Any
    bands: Sequence[str] = ("low", "middle")
    sections: Sequence[int] = (512, 513)
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    kernel_size_final: Any = None
    dilated_final: Any = False
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    depth_final: Any = None
    sources: Sequence[str] = ("bass", "drums", "other", "vocals")
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        """(B, 1, C, n_bins, n_frames) -> (B, n_sources, C, n_bins, n_frames)."""
        x = input[:, 0]
        outs = []
        for source in self.sources:
            y = MMDenseNet(
                self.in_channels, self.num_features, self.growth_rate,
                self.kernel_size, bands=self.bands, sections=self.sections,
                scale=self.scale, dilated=self.dilated, norm=self.norm,
                nonlinear=self.nonlinear, depth=self.depth,
                growth_rate_final=self.growth_rate_final,
                kernel_size_final=self.kernel_size_final,
                dilated_final=self.dilated_final, norm_final=self.norm_final,
                nonlinear_final=self.nonlinear_final, depth_final=self.depth_final,
                eps=self.eps, name=f"net_{source}",
            )(x, train=train)
            outs.append(y)
        return jnp.stack(outs, axis=1)


class TimeDomainWrapper:
    """stft -> |.| -> base -> re-apply mixture phase -> istft.

    Generic equivalent of the reference's per-model TimeDomainWrappers
    (`src/models/m_densenet.py:309`, `src/models/d3net.py:564`,
    `src/models/umx.py:501`): callable on (params, waveform (B, C, T)).
    """

    def __init__(self, model, params, n_fft: int, hop_length: Optional[int] = None, window_fn: str = "hann"):
        self.model, self.params = model, params
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 4
        self.window = build_window(n_fft, window_fn)

    def __call__(self, input):
        T = input.shape[-1]
        spec = stft(input, self.n_fft, self.hop_length, window=self.window)
        amp, angle = jnp.abs(spec), jnp.angle(spec)
        est = self.model.apply(self.params, amp)
        return istft(
            est * jnp.exp(1j * angle), self.n_fft, self.hop_length,
            window=self.window, length=T,
        )
