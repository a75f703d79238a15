"""Long-form inference: static-shape chunked scan with crossfade overlap-add.

BASELINE.json calls this out: "make long-form inference a static-shape
chunked scan so XLA compiles once per model". The reference instead runs a
serial python loop per chunk (egs/musdb18/umx/src/adhoc_driver.py:323-341).

Here the mixture is segmented into 50%-overlapping chunks, the model runs
over the chunk axis inside ONE jitted lax.scan, and triangular-window
overlap-add crossfades chunk boundaries. Chunk count is padded up to the
next power of two so arbitrary lengths reuse a tiny set of compiled
programs (log2 bucketing).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def separate_longform(
    apply_fn: Callable,
    params,
    mixture: jnp.ndarray,
    chunk_samples: int,
    n_sources: int,
    bucket: bool = True,
):
    """mixture (B, 1, T) -> (B, n_sources, T) via chunked scan.

    apply_fn(params, (B, 1, chunk)) -> (B, n_sources, chunk); hop is
    chunk/2 with a triangular crossfade (COLA at 50% overlap).
    """
    B, _, T = mixture.shape
    hop = chunk_samples // 2
    n_chunks = max(1, -(-max(T - chunk_samples, 0) // hop) + 1)
    if bucket:
        n_chunks = _next_pow2(n_chunks)
    total = (n_chunks - 1) * hop + chunk_samples
    x = jnp.pad(mixture, ((0, 0), (0, 0), (0, total - T)))

    starts = np.arange(n_chunks) * hop
    chunks = jnp.stack([x[:, :, s : s + chunk_samples] for s in starts], axis=0)

    def step(carry, chunk):
        return carry, apply_fn(params, chunk)

    _, outs = jax.lax.scan(step, 0, chunks)  # (n_chunks, B, n_src, chunk)

    # Triangular crossfade, normalized by the accumulated window coverage
    # (exact partition of unity for any window/edge configuration).
    w = np.bartlett(chunk_samples + 2)[1:-1].astype(np.float32)
    weights = np.tile(w, (n_chunks, 1))
    weights_j = jnp.asarray(weights)[:, None, None, :]  # (n_chunks, 1, 1, chunk)

    # Accumulate the crossfade in f32 regardless of compute dtype (a bf16
    # accumulator both loses precision and trips scatter dtype promotion).
    y = jnp.zeros((B, n_sources, total), jnp.float32)
    wsum = np.zeros(total, np.float32)
    weighted = outs.astype(jnp.float32) * weights_j
    for i in range(n_chunks):  # static small loop; XLA fuses the adds
        s = int(starts[i])
        y = y.at[:, :, s : s + chunk_samples].add(weighted[i])
        wsum[s : s + chunk_samples] += weights[i]
    y = y / jnp.asarray(np.maximum(wsum, 1e-8))
    return y[..., :T].astype(mixture.dtype)
