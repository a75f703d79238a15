"""MRX (Cocktail-fork): multi-resolution cross-network with in-model STFT.

Capability parity: reference `src/models/mrx.py` (MultiResolutionCrossNet:14,
EncoderBlock:~300, DecoderBlock:~360, in-model STFT:337/iSTFT:368): one
encoder per STFT resolution (shared hop so frames align), X-UMX-style
bridging means across resolutions, and per-source per-resolution mask
decoders whose iSTFT outputs sum in the time domain.
Petermann et al., arXiv:2110.09958.

Note kept for parity: the reference's forward path does NOT apply the
encoder's input affine parameters (mrx.py:103-110 uses |STFT| directly);
we reproduce that behavior.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.rnn import choose_rnn
from ..ops.stft import istft, stft
from ..ops.windows import build_window
from .base import SeparationModelMixin, register_model
from .umx import TransformBlock1d

EPS = 1e-12
__sources__ = ["music", "speech", "sfx"]


@register_model
class MultiResolutionCrossNet(nn.Module, SeparationModelMixin):
    """(B, in_channels, T) waveform -> (B, n_sources, in_channels, T)."""

    in_channels: int
    hidden_channels: int = 512
    num_layers: int = 3
    n_fft: Sequence[int] = (512, 1024, 2048)
    hop_length: int = 256
    window_fn: str = "hann"
    causal: bool = False
    rnn_type: str = "lstm"
    sources: Tuple[str, ...] = tuple(__sources__)
    eps: float = EPS

    def _window(self, n_fft: int) -> jnp.ndarray:
        """Analysis/synthesis window for one resolution. The reference swaps
        to a RECTANGULAR window when hop == n_fft (mrx.py:343-346, 374-377):
        non-overlapping Hann frames would zero the frame edges and the iSTFT
        window-sum normalization would divide by ~0. The published
        baseline.yaml hits this (fft_size [1024, 2048, 4096], hop 1024)."""
        if self.hop_length == n_fft:
            return jnp.ones((n_fft,), jnp.float32)
        return build_window(n_fft, self.window_fn)

    @nn.compact
    def __call__(self, input, train: bool = False):
        C, H = self.in_channels, self.hidden_channels
        B, _, T = input.shape
        n_ffts = list(self.n_fft)

        # Per-resolution analysis + fc blocks. The reference's in-model STFT
        # (mrx.py:350-366) zero-pads (n_fft//2, n_fft//2 + hop) and runs
        # center=False -- constant padding plus one extra trailing frame, NOT
        # the usual reflect-centered torch.stft. Reproduced exactly.
        latents, enc_feats = [], []
        for i, nf in enumerate(n_ffts):
            w = self._window(nf)
            pad = nf // 2
            xp = jnp.pad(input, ((0, 0), (0, 0), (pad, pad + self.hop_length)))
            spec = stft(xp, nf, self.hop_length, window=w, center=False)  # (B, C, F, S)
            latents.append(spec)
            amp = jnp.abs(spec)
            n_frames = amp.shape[-1]
            h = jnp.transpose(amp, (0, 3, 1, 2)).reshape(B, n_frames, -1)
            h = TransformBlock1d(H, nonlinear="tanh", name=f"enc_block{i}")(h, train=train)
            enc_feats.append(h)
        stacked = jnp.stack(enc_feats, axis=0)  # (R, B, S, H)
        x_mean = jnp.mean(stacked, axis=0)

        rnn_hidden = H if self.causal else H // 2
        rnn_cat = []
        for i in range(len(n_ffts)):
            h_rnn = choose_rnn(
                self.rnn_type, rnn_hidden, num_layers=self.num_layers,
                bidirectional=not self.causal, parent_name=f"rnn{i}",
            )(x_mean)
            rnn_cat.append(jnp.concatenate([stacked[i], h_rnn], axis=-1))
        head_in = jnp.mean(jnp.stack(rnn_cat, axis=0), axis=0)  # (B, S, 2H)
        n_frames = head_in.shape[1]

        outputs = []
        for source in self.sources:
            per_res = []
            for i, nf in enumerate(n_ffts):
                n_bins = nf // 2 + 1
                h = TransformBlock1d(H, nonlinear="relu", name=f"dec_{source}_{i}_net0")(head_in, train=train)
                h = TransformBlock1d(C * n_bins, name=f"dec_{source}_{i}_net1")(h, train=train)
                h = h.reshape(B, n_frames, C, n_bins)
                h = jnp.transpose(h, (0, 2, 3, 1))  # (B, C, F, S)
                scale_out = self.param(f"scale_out_{source}_{i}", nn.initializers.ones, (n_bins,))
                bias_out = self.param(f"bias_out_{source}_{i}", nn.initializers.zeros, (n_bins,))
                mask = nn.relu(scale_out[:, None] * h + bias_out[:, None])
                w = self._window(nf)
                y = istft(mask * latents[i], nf, self.hop_length, window=w, length=T)
                per_res.append(y)
            outputs.append(jnp.sum(jnp.stack(per_res, axis=0), axis=0))
        return jnp.stack(outputs, axis=1)  # (B, n_src, C, T)
