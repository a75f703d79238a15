"""LaSAFT: latent source attentive frequency transformation (+ TDF/TFC).

Capability parity: reference `src/models/lasaft.py` (LaSAFT:17,
TFCLaSAFT:63, TFCLightSAFT) and the TDF2d/TFC2d/MultiheadTDF2d blocks from
`src/models/cunet.py:402-670`. Choi et al., arXiv:2010.11631.

Layouts channels-last: spectrogram maps are (B, F, T, C).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .modules import choose_nonlinear

EPS = 1e-12


class TDF2d(nn.Module):
    """Time-distributed fully-connected over the bin axis.

    (B, F_in, T, C) -> (B, F_out, T, C): a Dense along frequency applied
    per (time, channel).
    """

    out_bins: int
    nonlinear: Optional[str] = "relu"
    use_bias: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        h = jnp.moveaxis(x, 1, -1)  # (B, T, C, F)
        h = nn.Dense(self.out_bins, use_bias=self.use_bias, name="fc")(h)
        h = jnp.moveaxis(h, -1, 1)
        if self.nonlinear:
            h = choose_nonlinear(self.nonlinear)(h)
        return h


class MultiheadTDF2d(nn.Module):
    """num_heads parallel TDFs stacked on a new head axis (stack_dim=2)."""

    out_bins: int
    num_heads: int = 2
    nonlinear: Optional[str] = "relu"
    use_bias: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        heads = [
            TDF2d(self.out_bins, self.nonlinear, self.use_bias, self.eps, name=f"head{i}")(x)
            for i in range(self.num_heads)
        ]
        return jnp.stack(heads, axis=-1)  # (B, F_out, T, C, H)


class TFC2d(nn.Module):
    """Time-frequency dense conv block (reference TFC blocks in cunet.py)."""

    growth_rate: int
    kernel_size: Any = (3, 3)
    num_layers: int = 2
    nonlinear: Optional[str] = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, train: bool = False):
        kh, kw = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (self.kernel_size,) * 2
        pads = (((kh - 1) // 2, (kh - 1) - (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) - (kw - 1) // 2))
        feats = x
        for idx in range(self.num_layers):
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"norm{idx}")(feats)
            h = choose_nonlinear(self.nonlinear)(h)
            h = nn.Conv(self.growth_rate, (kh, kw), padding=pads, name=f"conv{idx}")(h)
            feats = jnp.concatenate([feats, h], axis=-1) if idx < self.num_layers - 1 else h
        return feats


class LaSAFT(nn.Module):
    """Attention over latent-source heads (reference LaSAFT:17).

    __call__(value (B, F, T, C, H), embedding (B, E)) -> (B, F, T, C).
    """

    hidden_dim: int
    num_heads: int = 2

    @nn.compact
    def __call__(self, value, embedding):
        key = self.param("key", nn.initializers.normal(1.0), (self.hidden_dim, self.num_heads))
        query = nn.Dense(self.hidden_dim, name="transform_query")(embedding)  # (B, hid)
        qk = (query @ key) / jnp.sqrt(jnp.asarray(self.hidden_dim, value.dtype))
        atten = nn.softmax(qk, axis=-1)  # (B, H)
        return jnp.einsum("bftch,bh->bftc", value, atten)


class TFCLaSAFT(nn.Module):
    """TFC + LaSAFT residual (reference TFCLaSAFT:63).

    (B, F, T, C), (B, E) -> (B, F, T, growth_rate).
    """

    growth_rate: int
    hidden_dim: int
    n_bins: int
    bottleneck_bins: int
    kernel_size: Any = (3, 3)
    num_layers: int = 2
    num_heads: int = 2
    nonlinear: str = "relu"
    eps: float = EPS

    @nn.compact
    def __call__(self, x, embedding, train: bool = False):
        h = TFC2d(self.growth_rate, self.kernel_size, self.num_layers,
                  self.nonlinear, self.eps, name="tfc2d")(x, train=train)
        v = TDF2d(self.bottleneck_bins, self.nonlinear, eps=self.eps, name="tdf_in")(h)
        v = MultiheadTDF2d(self.n_bins, self.num_heads, self.nonlinear, eps=self.eps, name="tdf_heads")(v)
        att = LaSAFT(self.hidden_dim, self.num_heads, name="lasaft")(v, embedding)
        return h + att
