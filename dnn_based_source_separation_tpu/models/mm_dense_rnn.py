"""MMDenseRNN / MMDenseLSTM: RNN-infused multi-band multi-scale DenseNets.

Capability parity: reference `src/models/mm_dense_rnn.py` (MMDenseRNN:143),
`src/models/mm_dense_lstm.py` (MMDenseLSTM:204, ParallelMMDenseLSTM:17) and
the block library `src/models/dense_rnn.py` (RNNAfterDenseBlock:53,
RNNBeforeDenseBlock:108, DenseRNNParallelBlock:160): a frame-axis RNN reads
a 1-channel bottleneck of the 2-D map (features = bins at that scale) and
its per-frame output is concatenated back as an extra channel.
Takahashi et al., "MMDenseLSTM" (arXiv:1805.02410).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import choose_rnn
from .base import SeparationModelMixin, register_model
from .m_densenet import (
    EPS,
    DenseBlock,
    GLU2d,
    _expand,
    _pair,
)
from .mm_densenet import FULL


class FrameRNN(nn.Module):
    """1x1 bottleneck -> frame-axis RNN over bin features -> linear back.

    (B, H, W, C) -> (B, H, W, 1) (reference dense_rnn.py RNNBlock:15).
    """

    hidden_channels: int
    rnn_type: str = "lstm"
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.Conv(1, (1, 1), name="bottleneck_conv2d")(x)  # (B, H, W, 1)
        h = jnp.transpose(h[..., 0], (0, 2, 1))  # (B, W, H): frames as time
        h = choose_rnn(
            self.rnn_type, self.hidden_channels,
            bidirectional=not self.causal, parent_name="rnn",
        )(h)
        h = nn.Dense(H, name="linear")(h)  # (B, W, H)
        return jnp.transpose(h, (0, 2, 1))[..., None]  # (B, H, W, 1)


class DenseRNNBlock(nn.Module):
    """DenseBlock combined with a FrameRNN at the given position."""

    growth_rate: Any
    kernel_size: Any
    hidden_channels: int = 0
    depth: Optional[int] = None
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    causal: bool = False
    rnn_type: str = "lstm"
    rnn_position: str = "parallel"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        # depth == 0 with an RNN: the reference builds a pure RNNBlock
        # (m_dense_rnn.py:75-81, dense_rnn.py:15) — rnn output only, no
        # dense path, out_channels = 1. The MMDenseLSTM paper config uses
        # this for the high band's bottleneck (hidden [0,0,4,0,0], depth
        # [1,1,0,1,1]).
        eff_depth = (len(self.growth_rate)
                     if isinstance(self.growth_rate, (list, tuple))
                     else self.depth)
        if eff_depth == 0 and self.hidden_channels > 0:
            return FrameRNN(self.hidden_channels, self.rnn_type, self.causal,
                            name="rnn_block")(x)
        dense = DenseBlock(
            self.growth_rate, self.kernel_size, depth=self.depth,
            dilated=self.dilated, norm=self.norm, nonlinear=self.nonlinear,
            eps=self.eps, name="dense_block",
        )
        if self.hidden_channels <= 0:
            return dense(x, train=train)
        rnn = FrameRNN(self.hidden_channels, self.rnn_type, self.causal, name="rnn_block")
        if self.rnn_position == "parallel":
            return jnp.concatenate([dense(x, train=train), rnn(x)], axis=-1)
        if self.rnn_position == "after":
            y = dense(x, train=train)
            return jnp.concatenate([y, rnn(y)], axis=-1)
        if self.rnn_position == "before":
            y = jnp.concatenate([x, rnn(x)], axis=-1)
            return dense(y, train=train)
        raise ValueError(f"Unsupported rnn_position: {self.rnn_position}")


class MDenseRNNBackbone(nn.Module):
    """MDenseNetBackbone with DenseRNN blocks (reference m_dense_rnn.py)."""

    num_features: int
    growth_rate: Sequence[int]
    hidden_channels: Sequence[int]
    kernel_size: Any = (3, 3)
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    causal: bool = False
    rnn_type: str = "lstm"
    rnn_position: str = "parallel"
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth_rate = list(self.growth_rate)
        hidden = list(self.hidden_channels)
        assert len(growth_rate) % 2 == 1
        assert len(hidden) == len(growth_rate)
        n_enc = len(growth_rate) // 2
        depth = _expand(self.depth, len(growth_rate), int)
        dilated = _expand(self.dilated, len(growth_rate), bool)
        norm = _expand(self.norm, len(growth_rate), (bool, str))
        nonlinear = _expand(self.nonlinear, len(growth_rate), (bool, str))

        kh, kw = _pair(self.kernel_size)
        pads = ((0, 0), ((kh - 1) // 2, (kh - 1) - (kh - 1) // 2),
                ((kw - 1) // 2, (kw - 1) - (kw - 1) // 2), (0, 0))
        x = jnp.pad(x, pads)
        x = nn.Conv(self.num_features, (kh, kw), padding="VALID", name="conv2d")(x)

        sh, sw = _pair(self.scale)
        skips = []
        for idx in range(n_enc):
            H, W = x.shape[1], x.shape[2]
            ph, pw = (sh - H % sh) % sh, (sw - W % sw) % sw
            x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
            x = DenseRNNBlock(
                growth_rate[idx], self.kernel_size, hidden_channels=hidden[idx],
                depth=depth[idx], dilated=dilated[idx], norm=norm[idx],
                nonlinear=nonlinear[idx], causal=self.causal,
                rnn_type=self.rnn_type, rnn_position=self.rnn_position,
                eps=self.eps, name=f"encoder{idx}",
            )(x, train=train)
            skip = x[:, ph // 2 : x.shape[1] - (ph - ph // 2), pw // 2 : x.shape[2] - (pw - pw // 2)]
            skips.append(skip)
            x = nn.avg_pool(x, (sh, sw), strides=(sh, sw))

        x = DenseRNNBlock(
            growth_rate[n_enc], self.kernel_size, hidden_channels=hidden[n_enc],
            depth=depth[n_enc], dilated=dilated[n_enc], norm=norm[n_enc],
            nonlinear=nonlinear[n_enc], causal=self.causal,
            rnn_type=self.rnn_type, rnn_position=self.rnn_position,
            eps=self.eps, name="bottleneck",
        )(x, train=train)

        for j, idx in enumerate(range(n_enc + 1, len(growth_rate))):
            skip = skips[n_enc - 1 - j]
            C = x.shape[-1]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"decoder{j}_norm")(x)
            x = nn.ConvTranspose(C, (sh, sw), strides=(sh, sw), name=f"decoder{j}_up")(x)
            dh, dw = x.shape[1] - skip.shape[1], x.shape[2] - skip.shape[2]
            x = x[:, dh // 2 : x.shape[1] - (dh - dh // 2), dw // 2 : x.shape[2] - (dw - dw // 2)]
            x = jnp.concatenate([x, skip], axis=-1)
            x = DenseRNNBlock(
                growth_rate[idx], self.kernel_size, hidden_channels=hidden[idx],
                depth=depth[idx], dilated=dilated[idx], norm=norm[idx],
                nonlinear=nonlinear[idx], causal=self.causal,
                rnn_type=self.rnn_type, rnn_position=self.rnn_position,
                eps=self.eps, name=f"decoder{j}",
            )(x, train=train)

        if self.out_channels is not None:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="pointwise_norm")(x)
            x = nn.Conv(self.out_channels, (1, 1), name="pointwise_conv2d")(x)
        return x


@register_model
class MMDenseRNN(nn.Module, SeparationModelMixin):
    """(B, in_channels, n_bins, n_frames) amplitude -> same shape."""

    in_channels: int
    num_features: Any
    growth_rate: Any
    hidden_channels: Any
    kernel_size: Any
    bands: Sequence[str] = ("low", "middle")
    sections: Sequence[int] = (512, 513)
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    hidden_channels_final: int = 0
    kernel_size_final: Any = None
    dilated_final: Any = False
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    depth_final: Any = None
    causal: bool = False
    rnn_type: str = "rnn"
    rnn_position: str = "parallel"
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
        x = jnp.transpose(x, (0, 2, 3, 1))

        out_channels = max(self._band_cfg(self.growth_rate, b)[-1] for b in bands)
        offsets = [0]
        for s in sections:
            offsets.append(offsets[-1] + s)

        band_outs = []
        for idx, band in enumerate(bands):
            xb = x[:, offsets[idx] : offsets[idx + 1]]
            gr = self._band_cfg(self.growth_rate, band)
            extra = out_channels if gr[-1] < out_channels else None
            yb = MDenseRNNBackbone(
                self._band_cfg(self.num_features, band), gr,
                self._band_cfg(self.hidden_channels, band),
                self._band_cfg(self.kernel_size, band),
                scale=self._band_cfg(self.scale, band),
                dilated=self._band_cfg(self.dilated, band),
                norm=self._band_cfg(self.norm, band),
                nonlinear=self._band_cfg(self.nonlinear, band),
                depth=self._band_cfg(self.depth, band),
                causal=self.causal,
                rnn_type=self.rnn_type, rnn_position=self.rnn_position,
                out_channels=extra, eps=self.eps, name=f"net_{band}",
            )(xb, train=train)
            band_outs.append(yb)
        x_bands = jnp.concatenate(band_outs, axis=1)

        x_full = MDenseRNNBackbone(
            self._band_cfg(self.num_features, FULL),
            self._band_cfg(self.growth_rate, FULL),
            self._band_cfg(self.hidden_channels, FULL),
            self._band_cfg(self.kernel_size, FULL),
            scale=self._band_cfg(self.scale, FULL),
            dilated=self._band_cfg(self.dilated, FULL),
            norm=self._band_cfg(self.norm, FULL),
            nonlinear=self._band_cfg(self.nonlinear, FULL),
            depth=self._band_cfg(self.depth, FULL),
            causal=self.causal, rnn_type=self.rnn_type,
            rnn_position=self.rnn_position, eps=self.eps, name=f"net_{FULL}",
        )(x, train=train)

        h = jnp.concatenate([x_bands, x_full], axis=-1)
        h = DenseRNNBlock(
            self.growth_rate_final, self.kernel_size_final or self.kernel_size,
            hidden_channels=self.hidden_channels_final, depth=self.depth_final,
            dilated=self.dilated_final, norm=self.norm_final,
            nonlinear=self.nonlinear_final, causal=self.causal,
            rnn_type=self.rnn_type, rnn_position=self.rnn_position,
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
class MMDenseLSTM(MMDenseRNN):
    """MMDenseRNN with LSTM recurrences (reference mm_dense_lstm.py:204)."""

    rnn_type: str = "lstm"


@register_model
class ParallelMMDenseLSTM(nn.Module, SeparationModelMixin):
    """One MMDenseLSTM per stem (reference mm_dense_lstm.py:17)."""

    in_channels: int
    num_features: Any
    growth_rate: Any
    hidden_channels: Any
    kernel_size: Any
    bands: Sequence[str] = ("low", "middle")
    sections: Sequence[int] = (512, 513)
    scale: Any = (2, 2)
    dilated: Any = False
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    hidden_channels_final: int = 0
    kernel_size_final: Any = None
    dilated_final: Any = False
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    depth_final: Any = None
    causal: bool = False
    rnn_position: str = "parallel"
    rnn_type: str = "lstm"
    sources: Sequence[str] = ("bass", "drums", "other", "vocals")
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        x = input[:, 0]
        outs = []
        for source in self.sources:
            y = MMDenseLSTM(
                self.in_channels, self.num_features, self.growth_rate,
                self.hidden_channels, self.kernel_size,
                bands=self.bands, sections=self.sections, scale=self.scale,
                dilated=self.dilated, norm=self.norm, nonlinear=self.nonlinear,
                depth=self.depth, growth_rate_final=self.growth_rate_final,
                hidden_channels_final=self.hidden_channels_final,
                kernel_size_final=self.kernel_size_final,
                dilated_final=self.dilated_final, norm_final=self.norm_final,
                nonlinear_final=self.nonlinear_final, depth_final=self.depth_final,
                causal=self.causal, rnn_position=self.rnn_position,
                rnn_type=self.rnn_type,
                eps=self.eps, name=f"net_{source}",
            )(x, train=train)
            outs.append(y)
        return jnp.stack(outs, axis=1)
