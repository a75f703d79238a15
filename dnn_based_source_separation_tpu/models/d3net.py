"""D3Net: multi-band densely-connected dense (D3) blocks with dilations.

Capability parity: reference `src/models/d3net.py` (D3Net:219,
D3NetBackbone:596, D3Block:938, Down/UpSampleD3Block:859/905) and
`src/models/d2net.py` (D2Block:100, D2BlockFixedDilation:9). Takahashi &
Mitsufuji, "D3Net" (arXiv:2010.01733).

Structure notes verified against the reference: the shipped D3Net composes
D2Blocks (split-accumulate dense blocks whose per-layer dilation is 2^i --
identical structure to our m_densenet.DenseBlock with dilated=True); a
D3Block applies the same split-accumulate pattern ACROSS D2Blocks. The
standalone MultiDilatedConv2d (src/modules/conv.py:227) is provided in
ops/multidilated.py for completeness.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import SeparationModelMixin, register_model
from .m_densenet import EPS, DenseBlock, GLU2d, _expand, _pair
from .mm_densenet import FULL


class D2Block(nn.Module):
    """Dense block with per-layer dilation 2^i (reference d2net.py:100)."""

    growth_rate: Any
    kernel_size: Any = (3, 3)
    dilated: Any = True
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DenseBlock(
            self.growth_rate, self.kernel_size, depth=self.depth,
            dilated=self.dilated, norm=self.norm, nonlinear=self.nonlinear,
            eps=self.eps, name="dense",
        )(x, train=train)


class D3Block(nn.Module):
    """Split-accumulate over D2Blocks (reference d3net.py:938)."""

    growth_rate: Any  # int (with num_blocks) or list
    kernel_size: Any = (3, 3)
    num_blocks: Optional[int] = None
    dilated: Any = True
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth_rate = self.growth_rate
        if isinstance(growth_rate, int):
            assert self.num_blocks is not None
            growth_rate = [growth_rate] * self.num_blocks
        growth_rate = list(growth_rate)
        n = len(growth_rate)
        dilated = _expand(self.dilated, n, (bool, str))
        norm = _expand(self.norm, n, (bool, str))
        nonlinear = _expand(self.nonlinear, n, (bool, str))

        x_residual = 0.0
        for idx in range(n):
            if idx > 0:
                c = growth_rate[idx - 1]
                x, x_residual = x_residual[..., :c], x_residual[..., c:]
            out_ch = sum(growth_rate[idx:])
            x = D2Block(
                out_ch, self.kernel_size, dilated=dilated[idx], norm=norm[idx],
                nonlinear=nonlinear[idx], depth=self.depth, eps=self.eps,
                name=f"d2block{idx}",
            )(x, train=train)
            x_residual = x_residual + x
        return x_residual


class D3NetBackbone(nn.Module):
    """conv -> D3 encoder -> D3 bottleneck -> D3 decoder (+1x1 head)."""

    num_features: int
    growth_rate: Sequence[int]
    kernel_size: Any = (3, 3)
    scale: Any = (2, 2)
    num_d2blocks: Any = None
    dilated: Any = True
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    out_channels: Optional[int] = None
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth_rate = list(self.growth_rate)
        assert len(growth_rate) % 2 == 1
        n_stages = len(growth_rate)
        n_enc = n_stages // 2
        num_d2 = _expand(self.num_d2blocks, n_stages, int)
        depth = _expand(self.depth, n_stages, int)
        dilated = _expand(self.dilated, n_stages, (bool, str))
        norm = _expand(self.norm, n_stages, (bool, str))
        nonlinear = _expand(self.nonlinear, n_stages, (bool, str))

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
            x = D3Block(
                growth_rate[idx], self.kernel_size, num_blocks=num_d2[idx],
                dilated=dilated[idx], norm=norm[idx], nonlinear=nonlinear[idx],
                depth=depth[idx], eps=self.eps, name=f"encoder{idx}",
            )(x, train=train)
            skip = x[:, ph // 2 : x.shape[1] - (ph - ph // 2), pw // 2 : x.shape[2] - (pw - pw // 2)]
            skips.append(skip)
            x = nn.avg_pool(x, (sh, sw), strides=(sh, sw))

        x = D3Block(
            growth_rate[n_enc], self.kernel_size, num_blocks=num_d2[n_enc],
            dilated=dilated[n_enc], norm=norm[n_enc], nonlinear=nonlinear[n_enc],
            depth=depth[n_enc], eps=self.eps, name="bottleneck",
        )(x, train=train)

        for j, idx in enumerate(range(n_enc + 1, n_stages)):
            skip = skips[n_enc - 1 - j]
            C = x.shape[-1]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"decoder{j}_norm")(x)
            x = nn.ConvTranspose(C, (sh, sw), strides=(sh, sw), name=f"decoder{j}_up")(x)
            dh, dw = x.shape[1] - skip.shape[1], x.shape[2] - skip.shape[2]
            x = x[:, dh // 2 : x.shape[1] - (dh - dh // 2), dw // 2 : x.shape[2] - (dw - dw // 2)]
            x = jnp.concatenate([x, skip], axis=-1)
            x = D3Block(
                growth_rate[idx], self.kernel_size, num_blocks=num_d2[idx],
                dilated=dilated[idx], norm=norm[idx], nonlinear=nonlinear[idx],
                depth=depth[idx], eps=self.eps, name=f"decoder{j}",
            )(x, train=train)

        if self.out_channels is not None:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="pointwise_norm")(x)
            x = nn.Conv(self.out_channels, (1, 1), name="pointwise_conv2d")(x)
        return x


@register_model
class D3Net(nn.Module, SeparationModelMixin):
    """(B, in_channels, n_bins, n_frames) amplitude -> same shape.

    Band configs are dicts keyed by band + 'full', mirroring the reference
    YAML (`egs/musdb18/d3net/config/paper/vocals.yaml`).
    """

    in_channels: int
    num_features: Any
    growth_rate: Any
    kernel_size: Any
    bands: Sequence[str] = ("low", "middle")
    sections: Sequence[int] = (256, 1344)
    scale: Any = (2, 2)
    num_d2blocks: Any = None
    dilated: Any = True
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    kernel_size_final: Any = None
    dilated_final: Any = True
    depth_final: Any = None
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    eps: float = EPS

    def _band_cfg(self, cfg, band):
        import collections.abc

        if isinstance(cfg, collections.abc.Mapping):
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
            yb = D3NetBackbone(
                self._band_cfg(self.num_features, band), gr,
                self._band_cfg(self.kernel_size, band),
                scale=self._band_cfg(self.scale, band),
                num_d2blocks=self._band_cfg(self.num_d2blocks, band),
                dilated=self._band_cfg(self.dilated, band),
                norm=self._band_cfg(self.norm, band),
                nonlinear=self._band_cfg(self.nonlinear, band),
                depth=self._band_cfg(self.depth, band),
                out_channels=extra, eps=self.eps, name=f"net_{band}",
            )(xb, train=train)
            band_outs.append(yb)
        x_bands = jnp.concatenate(band_outs, axis=1)

        x_full = D3NetBackbone(
            self._band_cfg(self.num_features, FULL),
            self._band_cfg(self.growth_rate, FULL),
            self._band_cfg(self.kernel_size, FULL),
            scale=self._band_cfg(self.scale, FULL),
            num_d2blocks=self._band_cfg(self.num_d2blocks, FULL),
            dilated=self._band_cfg(self.dilated, FULL),
            norm=self._band_cfg(self.norm, FULL),
            nonlinear=self._band_cfg(self.nonlinear, FULL),
            depth=self._band_cfg(self.depth, FULL),
            eps=self.eps, name=f"net_{FULL}",
        )(x, train=train)

        h = jnp.concatenate([x_bands, x_full], axis=-1)
        h = D2Block(
            self.growth_rate_final, self.kernel_size_final or self.kernel_size,
            dilated=self.dilated_final, norm=self.norm_final,
            nonlinear=self.nonlinear_final, depth=self.depth_final,
            eps=self.eps, name="d2block",
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
class ParallelD3Net(nn.Module, SeparationModelMixin):
    """One D3Net per stem (reference d3net.py ParallelD3Net:30)."""

    in_channels: int
    num_features: Any
    growth_rate: Any
    kernel_size: Any
    bands: Sequence[str] = ("low", "middle")
    sections: Sequence[int] = (256, 1344)
    scale: Any = (2, 2)
    num_d2blocks: Any = None
    dilated: Any = True
    norm: Any = True
    nonlinear: Any = "relu"
    depth: Any = None
    growth_rate_final: Any = None
    kernel_size_final: Any = None
    dilated_final: Any = True
    depth_final: Any = None
    norm_final: Any = True
    nonlinear_final: Any = "relu"
    sources: Sequence[str] = ("bass", "drums", "other", "vocals")
    eps: float = EPS

    @nn.compact
    def __call__(self, input, train: bool = False):
        x = input[:, 0]
        outs = []
        for source in self.sources:
            y = D3Net(
                self.in_channels, self.num_features, self.growth_rate,
                self.kernel_size, bands=self.bands, sections=self.sections,
                scale=self.scale, num_d2blocks=self.num_d2blocks,
                dilated=self.dilated, norm=self.norm, nonlinear=self.nonlinear,
                depth=self.depth, growth_rate_final=self.growth_rate_final,
                kernel_size_final=self.kernel_size_final,
                dilated_final=self.dilated_final, depth_final=self.depth_final,
                norm_final=self.norm_final, nonlinear_final=self.nonlinear_final,
                eps=self.eps, name=f"net_{source}",
            )(x, train=train)
            outs.append(y)
        return jnp.stack(outs, axis=1)
