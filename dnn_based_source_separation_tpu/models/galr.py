"""Standalone GALR backbone exports.

Capability parity: reference `src/models/galr.py` (GALR:9, GALRBlock:32,
GloballyAttentiveBlock:80, LowDimensionGloballyAttentiveBlock:135). The
implementations live in models/galrnet.py; this module keeps the
reference's import surface.
"""
from .galrnet import GALR, GALRBlock, GloballyAttentiveBlock
from .dprnn import IntraChunkRNN as LocallyRecurrentBlock
