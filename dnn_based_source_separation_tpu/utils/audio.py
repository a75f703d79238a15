"""Audio utilities: mu-law companding, PESQ harness hook.

Capability parity: reference `src/utils/utils_audio.py` (mu-law + Fourier
bases) and `src/utils/audio.py:72-91` (evaluate_pesq subprocess wrapper
around the ITU-T P.862 tool; see native/pesq for the C++ CLI).
"""
from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np


def mu_law_compand(x: np.ndarray, mu: int = 255) -> np.ndarray:
    """mu-law companding of [-1,1] float to [-1,1]."""
    x = np.asarray(x)
    return np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)


def inv_mu_law_compand(y: np.ndarray, mu: int = 255) -> np.ndarray:
    y = np.asarray(y)
    return np.sign(y) * ((1 + mu) ** np.abs(y) - 1) / mu


def mu_law_encode(x: np.ndarray, mu: int = 255) -> np.ndarray:
    """[-1,1] float -> integer class in [0, mu]."""
    y = mu_law_compand(x, mu)
    return ((y + 1) / 2 * mu + 0.5).astype(np.int32)


def mu_law_decode(idx: np.ndarray, mu: int = 255) -> np.ndarray:
    y = 2 * (idx.astype(np.float32) / mu) - 1
    return inv_mu_law_compand(y, mu)


def evaluate_pesq(pesq_bin: str, reference_path: str, estimated_path: str, sample_rate: int) -> float:
    """Shell out to a PESQ CLI (native/pesq C++ build or the ITU tool).

    Mirrors reference `egs/wsj0-mix/common/src/driver.py:354-357`: parse the
    'Prediction' line; callers treat empty output as the metric floor.
    """
    command = [pesq_bin, f"+{sample_rate}", reference_path, estimated_path]
    out = subprocess.check_output(command, text=True)
    for line in out.splitlines():
        if "Prediction" in line:
            return float(line.rstrip().split()[-1])
    raise RuntimeError(f"PESQ produced no prediction: {out[:200]}")


def load_piano_roll(midi_path: str, fs: int = 100):
    """Piano-roll loader (reference `src/utils/audio.py:45-70`).

    Requires pretty_midi, which is optional in the reference too; gated
    here with a clear error since this image does not ship it.
    """
    try:
        import pretty_midi
    except ImportError as exc:  # pragma: no cover - optional dependency
        raise ImportError(
            "load_piano_roll requires pretty_midi (optional, as in the "
            "reference); install it to use the NSynth/good-sounds recipes."
        ) from exc
    midi = pretty_midi.PrettyMIDI(midi_path)
    return midi.get_piano_roll(fs=fs)
