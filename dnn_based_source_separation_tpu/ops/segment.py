"""Dual-path chunking: segment (unfold) and overlap-add (fold).

Capability parity: reference `src/models/transform.py:6-65` (`Segment1d`,
`OverlapAdd1d`) -- the algorithmic "sequence parallelism" of the dual-path
family (DPRNN/DPTNet/SepFormer/GALR): long sequences are split into S chunks
of size K with hop P so intra-op cost is O(S*K^2) instead of O(T^2).

TPU-first design: channels-last layout (..., T, N) so N rides the lane dim;
segment is a static gather; overlap-add is a fold-by-reshape (no scatter)
when hop divides chunk_size (always true in recipes: hop = K/2).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .stft import _fold


def segment(x: jnp.ndarray, chunk_size: int, hop_size: int) -> jnp.ndarray:
    """(..., T, N) -> (..., S, chunk_size, N). Requires (T-K) % hop == 0."""
    T = x.shape[-2]
    if (T - chunk_size) % hop_size != 0:
        raise ValueError(
            f"T={T} incompatible with chunk_size={chunk_size}, hop={hop_size}; "
            "pad to the chunk grid first (see models.padding.segment_padding)"
        )
    S = (T - chunk_size) // hop_size + 1
    idx = np.arange(S)[:, None] * hop_size + np.arange(chunk_size)[None, :]
    return x[..., idx, :]


def overlap_add(chunks: jnp.ndarray, hop_size: int) -> jnp.ndarray:
    """(..., S, K, N) -> (..., T, N) with T = (S-1)*hop + K. Overlaps sum."""
    *lead, S, K, N = chunks.shape
    T = (S - 1) * hop_size + K
    x = jnp.moveaxis(chunks, -1, -3)  # (..., N, S, K)
    y = _fold(x, hop_size, T)  # (..., N, T)
    return jnp.moveaxis(y, -2, -1)  # (..., T, N)


def segment_padding(T: int, chunk_size: int, hop_size: int) -> tuple[int, int]:
    """Left/right zero-pad so that segment() tiles T exactly.

    Mirrors the padding arithmetic of the reference dual-path separators
    (`src/models/dprnn_tasnet.py:288-352`): pad hop on the left and whatever
    is needed on the right so (T_padded - K) % hop == 0.
    """
    rest = (T + hop_size - chunk_size) % hop_size
    right = (hop_size - rest) % hop_size
    return hop_size, right + hop_size


def band_split(x: jnp.ndarray, sections, axis: int = -2):
    """Split the frequency axis into bands (reference transform.py BandSplit:67).

    x channels-last (..., F, T, C) style; default axis=-2 is NOT assumed --
    pass the bin axis explicitly for your layout.
    """
    indices = np.cumsum(np.asarray(sections))[:-1]
    return jnp.split(x, indices, axis=axis)
