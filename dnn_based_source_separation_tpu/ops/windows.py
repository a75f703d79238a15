"""Analysis/synthesis windows.

Capability parity: reference `src/utils/audio.py:9-43` (`build_window`,
`build_optimal_window`). Implemented from the standard closed forms as pure
jnp functions (periodic windows, matching torch.hann_window(periodic=True)).
"""
from __future__ import annotations

import jax.numpy as jnp


def build_window(n: int, kind: str = "hann", dtype=jnp.float32) -> jnp.ndarray:
    """Return a periodic window of length ``n``.

    Supported kinds: hann, sine (sqrt-hann), hamming, blackman, rect/boxcar.
    """
    k = jnp.arange(n, dtype=jnp.float32)
    theta = 2.0 * jnp.pi * k / n
    kind = kind.lower() if kind else "rect"
    if kind in ("hann", "hanning"):
        w = 0.5 - 0.5 * jnp.cos(theta)
    elif kind in ("sine", "sqrt_hann", "cosine"):
        w = jnp.sin(jnp.pi * k / n)
    elif kind == "hamming":
        w = 0.54 - 0.46 * jnp.cos(theta)
    elif kind == "blackman":
        w = 0.42 - 0.5 * jnp.cos(theta) + 0.08 * jnp.cos(2.0 * theta)
    elif kind in ("rect", "rectangular", "boxcar", "none"):
        w = jnp.ones_like(k)
    else:
        raise ValueError(f"Unsupported window kind: {kind}")
    return w.astype(dtype)


def build_optimal_window(window: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Least-squares optimal synthesis window for a given analysis window.

    w_syn[n] = w[n] / sum_m w[n + m*hop]^2  (the denominator is the folded
    sum of squared shifted windows; see reference `src/utils/audio.py:26-43`).
    Requires len(window) % hop_length == 0 (standard in all recipes).
    """
    n = window.shape[0]
    if n % hop_length != 0:
        raise ValueError(f"window length {n} must be divisible by hop {hop_length}")
    ratio = n // hop_length
    sq = (window * window).reshape(ratio, hop_length)
    denom = jnp.tile(jnp.sum(sq, axis=0), ratio)
    return window / jnp.maximum(denom, 1e-12)
