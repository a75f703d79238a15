"""Streaming (causal, chunk-by-chunk) inference.

Capability parity: the reference's realtime pyaudio demo
(`egs/tutorials/conv-tasnet/speech-separation_ja.ipynb` + demo scripts)
ran a causal Conv-TasNet over microphone buffers. TPU-first redesign: a
stateful host-side wrapper around ONE jitted fixed-shape forward. Each call
processes a fixed-size hop of new samples; a rolling left-context buffer
(>= the model's receptive field) is prepended so causal models see their
full receptive field for every new sample. Convolutions are strictly causal
so this matches the offline pass; cumulative layer norm is the one
stream-dependent piece (offline it accumulates statistics from the stream
start, streamed from the window start), bounding agreement at ~23 dB for a
random-weight Conv-TasNet (tests/test_longform.py) — well below trained
separation error. An exactly-streaming cLN would carry running sums as
explicit state (future work, see ROADMAP).

Usage:
    stream = StreamingSeparator(model, params, hop_samples=4000,
                                context_samples=16000)
    for block in audio_blocks:          # (1, hop) float32 host arrays
        est = stream.process(block)     # (n_sources, hop)
    tail = stream.flush()
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class StreamingSeparator:
    """Stateful chunk-by-chunk separation for causal models."""

    def __init__(self, model, params, hop_samples: int, context_samples: int,
                 n_channels: int = 1):
        self.hop = int(hop_samples)
        self.context = int(context_samples)
        self.params = params
        self._buf = np.zeros((n_channels, self.context), np.float32)
        window = self.context + self.hop

        def forward(p, ctx_and_new):  # (C, context + hop)
            est = model.apply(p, ctx_and_new[None])  # (1, n_src, [C,] window)
            return est[0][..., -self.hop:]

        self._forward = jax.jit(forward)
        self._window = window

    def process(self, block: np.ndarray) -> np.ndarray:
        """block (C, hop) new samples -> (n_sources, [C,] hop) estimates."""
        block = np.asarray(block, np.float32)
        if block.ndim == 1:
            block = block[None]
        assert block.shape[-1] == self.hop, (
            f"streaming blocks must be exactly hop={self.hop} samples; "
            f"pad the final partial block or use flush()")
        x = np.concatenate([self._buf, block], axis=-1)  # (C, window)
        est = np.asarray(self._forward(self.params, jnp.asarray(x)))
        self._buf = x[:, -self.context:]
        return est

    def flush(self) -> np.ndarray:
        """Process a trailing zero block (drains the final hop of context)."""
        return self.process(np.zeros((self._buf.shape[0], self.hop), np.float32))

    def reset(self):
        self._buf[:] = 0.0
