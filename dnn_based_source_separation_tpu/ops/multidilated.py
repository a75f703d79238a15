"""Multi-dilated 2-D convolution (per-channel-group dilations).

Capability parity: reference `src/modules/conv.py:227` (MultiDilatedConv2d):
input channels are split into groups, group i is convolved with dilation
2^i (same padding), and the group outputs are SUMMED into out_channels.

TPU-first: each group's conv is an independent `nn.Conv` (NHWC); XLA fuses
the adds. Groups are static so the whole op unrolls into one program.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class MultiDilatedConv2d(nn.Module):
    """(B, H, W, C_in) -> (B, H, W, out_channels).

    in_channels: int (with groups) or per-group channel list.
    """

    out_channels: int
    kernel_size: Any = (3, 3)
    in_channels: Union[int, Sequence[int], None] = None
    groups: int | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        if isinstance(self.in_channels, (list, tuple)):
            sections = list(self.in_channels)
        else:
            groups = self.groups
            assert groups is not None, "Specify groups"
            assert C % groups == 0
            sections = [C // groups] * groups
        assert sum(sections) == C

        kh, kw = _pair(self.kernel_size)
        out = 0.0
        offset = 0
        for idx, sec in enumerate(sections):
            dil = 2**idx
            ph, pw = (kh - 1) * dil, (kw - 1) * dil
            pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
            xi = x[..., offset : offset + sec]
            out = out + nn.Conv(
                self.out_channels, (kh, kw), kernel_dilation=(dil, dil),
                padding=pads, use_bias=self.use_bias, name=f"conv{idx}",
            )(xi)
            offset += sec
        return out
