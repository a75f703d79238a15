"""Vision-style extras: MLP-Mixer, MetaFormer/PoolFormer, ViT.

Capability parity: reference `src/models/mlp_mixer.py:10` (MLPMixer,
MLPMixerBlock1d/2d, TokenMixerBlock1d/2d, MLPMixerPool1d),
`src/models/metaformer.py:18` (MetaFormer, ChannelMixerBlock1d/2d,
MLPBlock1d/2d, PatchEmbedding2d, OverlappedPatchEmbedding2d, Pool1d/2d),
`src/models/poolformer.py:10` (PoolFormer with staged backbone),
`src/models/vit.py:9` (ViT + ViTPool) and the patchify helper `SplitToPatch`
(`src/models/transform.py:94`). Channels-last implementations; patch
embedding is framed as one dense matmul over flattened patches (MXU) rather
than a strided conv.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import MultiheadAttention, positional_encoding


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def split_to_patch(x, patch_size):
    """(B, H, W, C) -> (B, n_patches, patch_h * patch_w * C)."""
    ph, pw = _pair(patch_size)
    B, H, W, C = x.shape
    assert H % ph == 0 and W % pw == 0
    x = x.reshape(B, H // ph, ph, W // pw, pw, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, (H // ph) * (W // pw), ph * pw * C)


class PatchEmbedding2d(nn.Module):
    """(B, H, W, C) -> (B, n_patches, embed_dim) (reference
    metaformer.py:183): non-overlapping patches as one dense matmul."""

    embed_dim: int
    patch_size: Any = (4, 4)
    to_1d: bool = True

    @nn.compact
    def __call__(self, x):
        ph, pw = _pair(self.patch_size)
        B, H, W, C = x.shape
        h = split_to_patch(x, (ph, pw))
        h = nn.Dense(self.embed_dim, name="proj")(h)
        if self.to_1d:
            return h
        return h.reshape(B, H // ph, W // pw, self.embed_dim)


class OverlappedPatchEmbedding2d(nn.Module):
    """Strided overlapping patch embedding (reference metaformer.py:231)."""

    embed_dim: int
    patch_size: Any = (7, 7)
    stride: Any = None
    to_1d: bool = True

    @nn.compact
    def __call__(self, x):
        ph, pw = _pair(self.patch_size)
        sh, sw = _pair(self.stride if self.stride is not None else self.patch_size)
        x = nn.Conv(self.embed_dim, (ph, pw), strides=(sh, sw), padding="SAME",
                    name="conv")(x)
        if self.to_1d:
            B, Hp, Wp, D = x.shape
            return x.reshape(B, Hp * Wp, D)
        return x


class MixerBlock(nn.Module):
    """Token-mixing + channel-mixing MLP block (MLPMixerBlock1d :190)."""

    tokens_hidden: int
    channels_hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Token mixing
        h = nn.LayerNorm(name="norm1")(x)
        h = jnp.swapaxes(h, 1, 2)
        h = nn.Dense(self.tokens_hidden, name="token_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[1], name="token_fc2")(h)
        h = jnp.swapaxes(h, 1, 2)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        # Channel mixing
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.channels_hidden, name="ch_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], name="ch_fc2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


def pool_tokens(x, pooling: str = "avg", axis: int = 1):
    """Sequence pooling head (reference MLPMixerPool1d:330 / ViTPool:149)."""
    if pooling == "avg":
        return jnp.mean(x, axis=axis)
    if pooling == "max":
        return jnp.max(x, axis=axis)
    if pooling == "cls":
        return jnp.take(x, 0, axis=axis)
    raise ValueError(f"Not support pooling={pooling}")


class MLPMixer(nn.Module):
    """(B, H, W, C) image/spectrogram -> (B, num_classes)."""

    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    tokens_hidden: int = 32
    channels_hidden: int = 128
    num_classes: int = 10
    pooling: str = "avg"
    dropout: float = 0.0
    bias_head: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PatchEmbedding2d(self.dim, self.patch_size, name="embed")(x)
        for idx in range(self.depth):
            x = MixerBlock(self.tokens_hidden, self.channels_hidden,
                           dropout=self.dropout, name=f"block{idx}")(x, train=train)
        x = nn.LayerNorm(name="norm")(x)
        x = pool_tokens(x, self.pooling)
        return nn.Dense(self.num_classes, use_bias=self.bias_head, name="head")(x)


class MetaFormerBlock(nn.Module):
    """norm -> token_mixer -> residual; norm -> MLP -> residual
    (reference metaformer.py:18 general form)."""

    token_mixer: Callable
    mlp_hidden: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + self.token_mixer(nn.LayerNorm(name="norm1")(x))
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.mlp_hidden, name="fc1")(h)
        h = nn.gelu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        return x + h


def pool1d_mixer(pool_size: int = 3):
    """Token-average mixer over the sequence axis minus identity
    (reference Pool1d:285 / poolformer TokenMixerBlock2d:344)."""

    def mixer(x):
        pad = pool_size // 2
        h = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        win = jnp.stack([h[:, i: i + x.shape[1]] for i in range(pool_size)], axis=0)
        return jnp.mean(win, axis=0) - x

    return mixer


def pool2d_mixer(pool_size: int = 3):
    """2d token pooling minus identity over (B, H', W', C) grids
    (reference Pool2d:306)."""

    def mixer(x):
        pad = pool_size // 2
        h = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        rows = []
        for i in range(pool_size):
            for j in range(pool_size):
                rows.append(h[:, i: i + x.shape[1], j: j + x.shape[2]])
        return jnp.mean(jnp.stack(rows, axis=0), axis=0) - x

    return mixer


class MetaFormer(nn.Module):
    """General MetaFormer classifier with a pluggable token mixer factory
    (reference metaformer.py:18)."""

    token_mixer_factory: Callable = pool1d_mixer
    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    mlp_hidden: int = 128
    num_classes: int = 10
    pooling: str = "avg"
    dropout: float = 0.0
    overlapped_embedding: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.overlapped_embedding:
            x = OverlappedPatchEmbedding2d(self.dim, self.patch_size, name="embed")(x)
        else:
            x = PatchEmbedding2d(self.dim, self.patch_size, name="embed")(x)
        for idx in range(self.depth):
            x = MetaFormerBlock(self.token_mixer_factory(), self.mlp_hidden,
                                dropout=self.dropout, name=f"block{idx}")(x, train=train)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.num_classes, name="head")(pool_tokens(x, self.pooling))


class PoolFormer(nn.Module):
    """MetaFormer with pooling token mixer (reference poolformer.py:10).

    `stage_dims`/`stage_depths` enable the reference's staged backbone
    (PoolFormerBackbone:163): each stage halves the token grid via an
    overlapped strided embedding and widens the channels.
    """

    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    mlp_hidden: int = 128
    pool_size: int = 3
    num_classes: int = 10
    pooling: str = "avg"
    dropout: float = 0.0
    stage_dims: Optional[Sequence[int]] = None
    stage_depths: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stage_dims is None:
            x = PatchEmbedding2d(self.dim, self.patch_size, name="embed")(x)
            for idx in range(self.depth):
                x = MetaFormerBlock(pool1d_mixer(self.pool_size), self.mlp_hidden,
                                    dropout=self.dropout, name=f"block{idx}")(x, train=train)
            x = nn.LayerNorm(name="norm")(x)
            return nn.Dense(self.num_classes, name="head")(pool_tokens(x, self.pooling))

        # Staged backbone over 2d token grids.
        depths = list(self.stage_depths or [self.depth] * len(self.stage_dims))
        for s, (sdim, sdepth) in enumerate(zip(self.stage_dims, depths)):
            if s == 0:
                x = PatchEmbedding2d(sdim, self.patch_size, to_1d=False, name="embed")(x)
            else:
                x = OverlappedPatchEmbedding2d(sdim, (3, 3), stride=(2, 2),
                                               to_1d=False, name=f"down{s}")(x)
            for idx in range(sdepth):
                x = MetaFormerBlock(pool2d_mixer(self.pool_size),
                                    max(self.mlp_hidden, 2 * sdim),
                                    dropout=self.dropout,
                                    name=f"stage{s}_block{idx}")(x, train=train)
        B, Hp, Wp, D = x.shape
        x = nn.LayerNorm(name="norm")(x.reshape(B, Hp * Wp, D))
        return nn.Dense(self.num_classes, name="head")(pool_tokens(x, self.pooling))


class ViT(nn.Module):
    """Vision transformer with CLS token (reference vit.py:9)."""

    patch_size: Any = (4, 4)
    dim: int = 64
    depth: int = 4
    num_heads: int = 4
    mlp_hidden: int = 128
    num_classes: int = 10
    pooling: str = "cls"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PatchEmbedding2d(self.dim, self.patch_size, name="embed")(x)
        B, N, D = x.shape
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), x], axis=1)
        x = x + positional_encoding(N + 1, D)[None]
        for idx in range(self.depth):

            def mixer(h, _idx=idx):
                return MultiheadAttention(D, self.num_heads, name=f"attn{_idx}")(h)

            x = MetaFormerBlock(mixer, self.mlp_hidden, dropout=self.dropout,
                                name=f"block{idx}")(x, train=train)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.num_classes, name="head")(pool_tokens(x, self.pooling))
