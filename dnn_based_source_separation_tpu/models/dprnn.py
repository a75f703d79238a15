"""DPRNN: dual-path recurrent backbone (intra-chunk BiLSTM + inter-chunk RNN).

Capability parity: reference `src/models/dprnn.py:9-171` (DPRNN, DPRNNBlock,
IntraChunkRNN, InterChunkRNN). Luo et al., arXiv:1910.06379.

TPU-first: chunked layout is (B, S, K, N) channels-last. The intra pass
reshapes to (B*S, K, N) -- many short scans, large batch -> the per-step
recurrence matmul stays MXU-shaped; the inter pass transposes to
(B*K, S, N). gLN statistics are over the FULL (S*K, N) extent, matching the
reference, which normalizes after flattening chunks.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norms import choose_layer_norm
from ..ops.rnn import choose_rnn

EPS = 1e-12


class IntraChunkRNN(nn.Module):
    """Per-chunk BiLSTM + fc + gLN + residual (reference :51-95).

    `stream_safe=True` (serving profile) replaces the gLN — whose statistics
    span the WHOLE utterance, so the reference's "causal" DPRNN actually
    reads arbitrarily far into the future here — with a cumulative LN over
    the time-major chunk order (s major, k minor): position (s, k) sees only
    chunks <= s, all of which are fully available once chunk s is, so the
    block is exactly streamable. Default False preserves reference parity.
    """

    num_features: int
    hidden_channels: int
    norm: bool = True
    rnn_type: str = "lstm"
    stream_safe: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, S, K, N = x.shape
        residual = x
        h = x.reshape(B * S, K, N)
        # Chunk-local recurrence: never carries state across streamed calls.
        h = choose_rnn(self.rnn_type, self.hidden_channels, bidirectional=True,
                       parent_name="rnn", stream_state=False)(h)
        h = nn.Dense(self.num_features, name="fc")(h)
        h = h.reshape(B, S * K, N)
        if self.norm:
            if self.stream_safe:
                h = choose_layer_norm("cLN", N, causal=True, eps=self.eps)(h)
            else:
                h = choose_layer_norm("gLN", N, eps=self.eps)(h)
        return h.reshape(B, S, K, N) + residual


class InterChunkRNN(nn.Module):
    """Across-chunk (Bi)LSTM + fc + norm + residual (reference :96-171).

    `stream_safe=True` changes the causal-cLN flattening from the
    reference's chunk-major order (position k*S + s: the cumulative stats at
    within-chunk position k include FUTURE chunks at positions < k —
    reference src/models/dprnn.py:139-141, not streamable and not actually
    causal) to time-major order (s*K + k: chunk s sees only chunks <= s).
    The uni-directional RNN over the chunk axis carries its final hidden
    state in the 'stream' collection, so chunked application continues the
    scan exactly.
    """

    num_features: int
    hidden_channels: int
    causal: bool = False
    norm: bool = True
    rnn_type: str = "lstm"
    stream_safe: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, S, K, N = x.shape
        residual = x
        # (B, S, K, N) -> (B, K, S, N) -> (B*K, S, N): scan over chunk index.
        h = jnp.swapaxes(x, 1, 2).reshape(B * K, S, N)
        h = choose_rnn(
            self.rnn_type, self.hidden_channels, bidirectional=not self.causal, parent_name="rnn"
        )(h)
        h = nn.Dense(self.num_features, name="fc")(h)
        h = h.reshape(B, K, S, N)
        if self.norm:
            norm_name = "cLN" if self.causal else "gLN"
            if self.stream_safe:
                # time-major: (B, S, K, N) -> (B, S*K, N)
                h = jnp.swapaxes(h, 1, 2).reshape(B, S * K, N)
                h = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps)(h)
                h = jnp.swapaxes(h.reshape(B, S, K, N), 1, 2)
            else:
                # Reference normalizes the (chunk_size*S) flattened sequence.
                h = h.reshape(B, K * S, N)
                h = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps)(h)
                h = h.reshape(B, K, S, N)
        return jnp.swapaxes(h, 1, 2) + residual


class DPRNNBlock(nn.Module):
    num_features: int
    hidden_channels: int
    causal: bool = False
    norm: bool = True
    rnn_type: str = "lstm"
    stream_safe: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        x = IntraChunkRNN(
            self.num_features, self.hidden_channels, norm=self.norm,
            rnn_type=self.rnn_type, stream_safe=self.stream_safe,
            eps=self.eps, name="intra_chunk_block",
        )(x)
        x = InterChunkRNN(
            self.num_features, self.hidden_channels, causal=self.causal,
            norm=self.norm, rnn_type=self.rnn_type, stream_safe=self.stream_safe,
            eps=self.eps, name="inter_chunk_block",
        )(x)
        return x


class DPRNN(nn.Module):
    """Stack of num_blocks dual-path blocks; (B, S, K, N) -> (B, S, K, N)."""

    num_features: int
    hidden_channels: int
    num_blocks: int = 6
    norm: bool = True
    causal: bool = False
    rnn_type: str = "lstm"
    stream_safe: bool = False
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        for idx in range(self.num_blocks):
            x = DPRNNBlock(
                self.num_features, self.hidden_channels, causal=self.causal,
                norm=self.norm, rnn_type=self.rnn_type,
                stream_safe=self.stream_safe, eps=self.eps, name=f"block{idx}",
            )(x)
        return x
