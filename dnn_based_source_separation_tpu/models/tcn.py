"""Older TCN naming (meta-tasnet era).

Capability parity: reference `src/models/tcn.py:19` (TemporalConvNet) -- an
earlier spelling of the dilated depthwise TCN. The modern implementation
lives in models/tdcn.py; this alias keeps the reference's import surface.
"""
from .tdcn import (
    DepthwiseSeparableConv1d,
    ResidualBlock1d,
    TimeDilatedConvBlock1d,
    TimeDilatedConvNet,
)

TemporalConvNet = TimeDilatedConvNet
