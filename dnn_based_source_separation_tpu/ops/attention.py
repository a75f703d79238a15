"""Attention primitives: sinusoidal PE, multi-head attention, encoder layer.

Capability parity: reference `src/models/transformer.py:7` (interleaved
sin/cos positional encoding) and the torch nn.MultiheadAttention /
nn.TransformerEncoderLayer semantics used by SepFormer/DPTNet/GALR.

TPU notes: attention runs on (B, T, E) channels-last; QKV projection is one
packed matmul; chunk sizes are <= 250 in all dual-path recipes so the
(T x T) score matrix stays small and VMEM-resident after XLA fusion.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def positional_encoding(T: int, num_features: int, base: float = 10000.0) -> jnp.ndarray:
    """(T, num_features) interleaved [sin, cos] PE (reference transformer.py:7)."""
    position = np.arange(T, dtype=np.float32)
    index = np.arange(0, num_features, 2, dtype=np.float32) / num_features
    indices = position[:, None] / (base ** index[None, :])  # (T, F//2)
    pe = np.stack([np.sin(indices), np.cos(indices)], axis=-1).reshape(T, num_features)
    return jnp.asarray(pe)


class MultiheadAttention(nn.Module):
    """Self-attention with torch nn.MultiheadAttention parameterization.

    (B, T, E) -> (B, T, E); packed QKV in_proj + out_proj.
    """

    embed_dim: int
    num_heads: int
    causal: bool = False
    dropout: float = 0.0  # on attention weights (torch MHA semantics)

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jnp.ndarray] = None, train: bool = False):
        B, T, E = x.shape
        h = self.num_heads
        d = E // h
        assert E % h == 0, "embed_dim must be divisible by num_heads"

        qkv = nn.Dense(3 * E, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, h, d).transpose(0, 2, 1, 3)  # (B, h, T, d)
        k = k.reshape(B, T, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, d).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, x.dtype))
        if self.causal:
            # Constant additive bias (trace-time numpy): avoids a runtime
            # select, which blocks XLA fusion on TPU (see PReLU note).
            bias = np.triu(np.full((T, T), -1e9, np.float32), k=1)
            scores = scores + jnp.asarray(bias, scores.dtype)
        if attn_mask is not None:
            # torch nn.MultiheadAttention convention: True = MASKED
            # (position not attended); float masks are added as-is.
            if attn_mask.dtype == jnp.bool_:
                scores = scores + jnp.where(attn_mask, -1e9, 0.0).astype(scores.dtype)
            else:
                scores = scores + attn_mask.astype(scores.dtype)
        attn = nn.softmax(scores, axis=-1)
        if self.dropout > 0.0:
            attn = nn.Dropout(rate=self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        return nn.Dense(E, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm torch TransformerEncoderLayer: MHA + FFN, per-token LN."""

    d_model: int
    num_heads: int
    d_ff: int = 2048
    nonlinear: str = "relu"
    norm_first: bool = False
    dropout: float = 0.0  # torch placement: attn weights, post-attn, FFN interior, post-FFN
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        act: Callable = {"relu": nn.relu, "gelu": nn.gelu}[self.nonlinear]

        def drop(h, name):
            if self.dropout > 0.0:
                h = nn.Dropout(rate=self.dropout, deterministic=not train, name=name)(h)
            return h

        def ffn(h):
            h = nn.Dense(self.d_ff, name="linear1")(h)
            h = act(h)
            h = drop(h, "dropout_ffn")
            return drop(nn.Dense(self.d_model, name="linear2")(h), "dropout2")

        attn = lambda h: drop(
            MultiheadAttention(self.d_model, self.num_heads, dropout=self.dropout, name="self_attn")(h, train=train),
            "dropout1",
        )
        norm1 = nn.LayerNorm(epsilon=self.eps, name="norm1")
        norm2 = nn.LayerNorm(epsilon=self.eps, name="norm2")

        if self.norm_first:
            x = x + attn(norm1(x))
            x = x + ffn(norm2(x))
        else:
            x = norm1(x + attn(x))
            x = norm2(x + ffn(x))
        return x
