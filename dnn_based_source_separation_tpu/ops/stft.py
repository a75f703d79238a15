"""STFT / iSTFT with torch.stft-compatible semantics.

Capability parity: reference `src/transforms/stft.py:3-96` (shape-normalizing
wrappers over torch.stft/istft supporting arbitrary leading dims) and the
legacy `src/algorithm/stft.py`. Re-designed for TPU: framing is a static
gather, the DFT rides `jnp.fft.rfft` (XLA TPU FFT), and overlap-add is a
fold-by-reshape (no scatter) whenever hop divides n_fft -- which every recipe
satisfies.

Conventions (matching torch.stft defaults used by the reference):
  * center=True: reflect-pad n_fft//2 on both sides.
  * onesided=True: n_freq = n_fft//2 + 1.
  * no normalization.
  * output shape (..., n_freq, n_frames), complex64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, frame_length).

    Reshape+slice+concat when hop divides the frame (TPU gathers are slow);
    static gather fallback otherwise.
    """
    T = x.shape[-1]
    n_frames = (T - frame_length) // hop_length + 1
    if frame_length % hop_length == 0 and T % hop_length == 0:
        ratio = frame_length // hop_length
        blocks = x.reshape(*x.shape[:-1], T // hop_length, hop_length)
        parts = [blocks[..., k : k + n_frames, :] for k in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    onesided: bool = True,
) -> jnp.ndarray:
    """Short-time Fourier transform over the last axis.

    Args:
      x: (..., T) real signal (any number of leading dims).
    Returns:
      (..., n_freq, n_frames) complex64 spectrogram.
    """
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if window is None:
        window = jnp.ones((win_length,), dtype=x.dtype)
    if win_length < n_fft:  # torch zero-pads the window symmetrically to n_fft
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")

    frames = _frame(x, n_fft, hop_length)  # (..., S, n_fft)
    frames = frames * window
    if onesided:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    else:
        spec = jnp.fft.fft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freq, S)


def _fold(frames: jnp.ndarray, hop_length: int, out_length: int) -> jnp.ndarray:
    """Overlap-add (..., S, L) frames at stride hop -> (..., out_length).

    When hop divides L this is a pure reshape/pad/sum (ratio static small
    loop) -- no scatter, fully fusible by XLA. Falls back to scatter-add
    otherwise.
    """
    *lead, S, L = frames.shape
    total = (S - 1) * hop_length + L
    if L % hop_length == 0:
        ratio = L // hop_length
        # frames -> (..., S, ratio, hop); shift each sub-band r by r*hop.
        sub = frames.reshape(*lead, S, ratio, hop_length)
        y = jnp.zeros((*lead, total), frames.dtype)
        for r in range(ratio):
            band = sub[..., :, r, :].reshape(*lead, S * hop_length)
            y = y.at[..., r * hop_length : r * hop_length + S * hop_length].add(band)
    else:
        idx = (np.arange(S)[:, None] * hop_length + np.arange(L)[None, :]).reshape(-1)
        flat = frames.reshape(*lead, S * L)
        y = jnp.zeros((*lead, total), frames.dtype)
        y = y.at[..., idx].add(flat)
    return y[..., :out_length] if out_length < total else y


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int | None = None,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    onesided: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT matching torch.istft (window-envelope normalized OLA).

    Args:
      spec: (..., n_freq, n_frames) complex spectrogram.
    Returns:
      (..., T) real signal.
    """
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if window is None:
        window = jnp.ones((win_length,), dtype=jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    frames_f = jnp.swapaxes(spec, -1, -2)  # (..., S, n_freq)
    if onesided:
        frames = jnp.fft.irfft(frames_f, n=n_fft, axis=-1)
    else:
        frames = jnp.fft.ifft(frames_f, axis=-1).real
    frames = frames * window

    S = frames.shape[-2]
    total = (S - 1) * hop_length + n_fft
    y = _fold(frames, hop_length, total)

    wsq = jnp.broadcast_to(window * window, (S, n_fft))
    env = _fold(wsq, hop_length, total)
    y = y / jnp.maximum(env, 1e-11)

    pad = n_fft // 2 if center else 0
    if length is not None:
        # torch.istft semantics: slice [pad : pad+length] from the raw OLA,
        # zero-padding only past the last synthesized sample.
        end = pad + length
        avail = min(end, total)
        y = y[..., pad:avail]
        if end > total:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, end - total)])
    elif center:
        y = y[..., pad : total - pad]
    return y
