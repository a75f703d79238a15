"""Standalone dual-path transformer backbone.

Capability parity: reference `src/models/dptransformer.py:10`
(DualPathTransformer) -- the same backbone DPTNet uses, exposed standalone.
"""
from .dptnet import DualPathTransformerBlock, ImprovedTransformer

import flax.linen as nn

from .m_densenet import EPS


class DualPathTransformer(nn.Module):
    """(B, S, K, N) -> (B, S, K, N) stack of dual-path transformer blocks."""

    num_features: int
    hidden_channels: int
    num_blocks: int = 6
    num_heads: int = 4
    norm: bool = True
    nonlinear: str = "relu"
    causal: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        for idx in range(self.num_blocks):
            x = DualPathTransformerBlock(
                self.num_features, self.hidden_channels, num_heads=self.num_heads,
                norm=self.norm, nonlinear=self.nonlinear, causal=self.causal,
                eps=self.eps, name=f"block{idx}",
            )(x)
        return x
