"""Vision-style extras: MLP-Mixer, MetaFormer/PoolFormer, ViT.

Capability parity: reference `src/models/mlp_mixer.py:10`,
`src/models/metaformer.py:18`, `src/models/poolformer.py:10`,
`src/models/vit.py:9` and the patchify helper `SplitToPatch`
(`src/models/transform.py:94`). Compact channels-last implementations.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import MultiheadAttention, positional_encoding


def split_to_patch(x, patch_size):
    """(B, H, W, C) -> (B, n_patches, patch_h * patch_w * C)."""
    ph, pw = patch_size if isinstance(patch_size, (tuple, list)) else (patch_size,) * 2
    B, H, W, C = x.shape
    assert H % ph == 0 and W % pw == 0
    x = x.reshape(B, H // ph, ph, W // pw, pw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, (H // ph) * (W // pw), ph * pw * C)


class MixerBlock(nn.Module):
    tokens_hidden: int
    channels_hidden: int

    @nn.compact
    def __call__(self, x):
        # Token mixing
        h = nn.LayerNorm(name="norm1")(x)
        h = jnp.swapaxes(h, 1, 2)
        h = nn.Dense(self.tokens_hidden, name="token_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[1], name="token_fc2")(h)
        x = x + jnp.swapaxes(h, 1, 2)
        # Channel mixing
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.channels_hidden, name="ch_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], name="ch_fc2")(h)
        return x + h


class MLPMixer(nn.Module):
    """(B, H, W, C) image/spectrogram -> (B, num_classes)."""

    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    tokens_hidden: int = 32
    channels_hidden: int = 128
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = split_to_patch(x, self.patch_size)
        x = nn.Dense(self.dim, name="embed")(x)
        for idx in range(self.depth):
            x = MixerBlock(self.tokens_hidden, self.channels_hidden, name=f"block{idx}")(x)
        x = nn.LayerNorm(name="norm")(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, name="head")(x)


class MetaFormerBlock(nn.Module):
    """norm -> token_mixer -> residual; norm -> MLP -> residual."""

    token_mixer: Callable
    mlp_hidden: int

    @nn.compact
    def __call__(self, x):
        x = x + self.token_mixer(nn.LayerNorm(name="norm1")(x))
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.mlp_hidden, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        return x + h


def _pool_mixer(pool_size: int = 3):
    def mixer(x):
        # (B, N, C) average pooling over tokens minus identity (PoolFormer).
        pad = pool_size // 2
        h = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        win = jnp.stack([h[:, i : i + x.shape[1]] for i in range(pool_size)], axis=0)
        return jnp.mean(win, axis=0) - x
    return mixer


class PoolFormer(nn.Module):
    """MetaFormer with pooling token mixer (reference poolformer.py:10)."""

    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    mlp_hidden: int = 128
    pool_size: int = 3
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = split_to_patch(x, self.patch_size)
        x = nn.Dense(self.dim, name="embed")(x)
        for idx in range(self.depth):
            x = MetaFormerBlock(_pool_mixer(self.pool_size), self.mlp_hidden, name=f"block{idx}")(x)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.num_classes, name="head")(jnp.mean(x, axis=1))


class ViT(nn.Module):
    """Vision transformer with CLS token (reference vit.py:9)."""

    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    num_heads: int = 4
    mlp_hidden: int = 128
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = split_to_patch(x, self.patch_size)
        x = nn.Dense(self.dim, name="embed")(x)
        B, N, D = x.shape
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        x = x + positional_encoding(N + 1, D)[None]
        for idx in range(self.depth):

            def mixer(h, _idx=idx):
                return MultiheadAttention(D, self.num_heads, name=f"attn{_idx}")(h)

            x = MetaFormerBlock(mixer, self.mlp_hidden, name=f"block{idx}")(x)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.num_classes, name="head")(x[:, 0])
