"""DPRNN-TasNet: Conv-TasNet skeleton with a dual-path recurrent separator.

Capability parity: reference `src/models/dprnn_tasnet.py` (DPRNNTasNet:15,
Separator:288): encoder -> norm + 1x1 bottleneck -> segment -> DPRNN ->
overlap-add -> PReLU -> mask head. Luo et al., arXiv:1910.06379.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.filterbank import choose_filterbank
from ..ops.norms import choose_layer_norm
from ..ops.segment import overlap_add, segment
from .base import SeparationModelMixin, register_model
from .dprnn import DPRNN
from .modules import PReLU
from .skeleton import LatentMaskingMixin

EPS = 1e-12


class Separator(nn.Module):
    """(B, T', N) -> (B, n_src, T', N) via dual-path chunking (reference :288)."""

    num_features: int
    bottleneck_channels: int = 64
    hidden_channels: int = 128
    chunk_size: int = 100
    hop_size: int = 50
    num_blocks: int = 6
    norm: bool = True
    mask_nonlinear: str = "sigmoid"
    causal: bool = True
    rnn_type: str = "lstm"
    stream_safe: bool = False
    n_sources: int = 2
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, N = x.shape
        K, P = self.chunk_size, self.hop_size

        norm_name = "cLN" if self.causal else "gLN"
        h = choose_layer_norm(norm_name, N, causal=self.causal, eps=self.eps)(x)
        h = nn.Dense(self.bottleneck_channels, name="bottleneck_conv1d")(h)

        streaming = (self.stream_safe
                     and self.is_mutable_collection("stream")
                     and not self.is_initializing())
        if streaming:
            h, n_emit = self._stream_chunks(h)
            T = n_emit
        elif self.stream_safe:
            # Serving profile: a CONSTANT left pad of K - P (so chunk s ends
            # at frame s*P + P: every chunk is complete as soon as its last
            # real frame arrives — zero lookahead) and a right pad to the
            # chunk grid. The reference pads symmetrically by an amount that
            # depends on the total length (src/models/dprnn_tasnet.py:
            # 288-352), which no streaming pass can know; default
            # stream_safe=False keeps that behavior for parity.
            pl = K - P
            pr = (P - T % P) % P
            h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))
            h = segment(h, K, P)
            h = self._dprnn(h)
            h = overlap_add(h, P)
            h = h[:, pl : pl + T]
        else:
            padding = (P - (T - K) % P) % P
            pl, pr = padding // 2, padding - padding // 2
            h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))
            h = segment(h, K, P)  # (B, S, K, F)
            h = self._dprnn(h)
            h = overlap_add(h, P)  # (B, T + padding, F)
            h = h[:, pl : h.shape[1] - pr]
        h = PReLU(name="prelu")(h)
        h = nn.Dense(self.n_sources * self.num_features, name="mask_conv1d")(h)
        h = h.reshape(B, T, self.n_sources, self.num_features)
        h = jnp.moveaxis(h, 2, 1)
        if self.mask_nonlinear == "sigmoid":
            return nn.sigmoid(h)
        if self.mask_nonlinear == "softmax":
            return nn.softmax(h, axis=1)
        if self.mask_nonlinear == "relu":
            return nn.relu(h)
        raise ValueError(f"Unsupported mask nonlinearity: {self.mask_nonlinear}")

    def _dprnn(self, chunks):
        return DPRNN(
            self.bottleneck_channels, self.hidden_channels,
            num_blocks=self.num_blocks, norm=self.norm, causal=self.causal,
            rnn_type=self.rnn_type, stream_safe=self.stream_safe,
            eps=self.eps, name="dprnn",
        )(chunks)

    def _stream_chunks(self, h):
        """Chunk-state streaming (mutable 'stream'): consume whole hops,
        emit OLA-complete frames. Carries across calls:

          * `seg_carry` — last K - P chunked frames (zero init == the
            offline left pad);
          * `ola_tail` — the trailing K - P frames of partial OLA sums
            (frames the NEXT chunk still adds to).

        All carried shapes are call-count invariant; the caller
        (`ExactStreamingSeparator`) aligns the latent stream to the hop
        grid HOST-side, so every streamed call delivers an exact multiple
        of hop_size frames. Emitted frames lag the newest input frame by
        K - P frames.

        FINAL call (stream end): T < P remaining frames (possibly 0). The
        offline stream_safe forward right-pads h to the hop grid and trims
        the OLA output to the real length; this call replicates that — it
        zero-pads the remaining frames to one whole hop at the LATENT
        level (exactly the offline pr pad), runs the last chunk, and emits
        the (K - P) + T remaining REAL frames in one shot (the last
        window's real prefix plus the settled OLA tail).
        """
        B, T, F = h.shape
        K, P = self.chunk_size, self.hop_size
        seg = self.variable("stream", "seg_carry",
                            lambda: jnp.zeros((B, K - P, F), h.dtype))
        ola = self.variable("stream", "ola_tail",
                            lambda: jnp.zeros((B, K - P, F), h.dtype))
        if T < P:  # final call: pad to the hop grid, emit everything real
            if T:
                hp = jnp.pad(h, ((0, 0), (0, P - T), (0, 0)))
                region = jnp.concatenate([seg.value, hp], axis=1)  # K frames
                y = overlap_add(self._dprnn(segment(region, K, P)), P)
                y = y.at[:, : K - P].add(ola.value)
            else:
                y = ola.value
            emit = y[:, : (K - P) + T]
            ola.value = jnp.zeros_like(ola.value)
            return emit, emit.shape[1]
        if T % P:
            raise ValueError(
                f"streamed call carries {T} latent frames, off the "
                f"hop_size={P} grid; feed whole hops "
                f"(ExactStreamingSeparator aligns this host-side)")
        region = jnp.concatenate([seg.value, h], axis=1)
        y = self._dprnn(segment(region, K, P))
        y = overlap_add(y, P)  # (B, T + K - P, F)
        y = y.at[:, : K - P].add(ola.value)
        emit = y[:, :T]
        ola.value = y[:, T:]
        seg.value = region[:, -(K - P):]
        return emit, T


@register_model
class DPRNNTasNet(nn.Module, LatentMaskingMixin, SeparationModelMixin):
    """Public API matches the reference: (B, 1, T) -> (B, n_sources, T)."""

    n_basis: int
    kernel_size: int
    stride: Optional[int] = None
    enc_basis: Optional[str] = "trainable"
    dec_basis: Optional[str] = "trainable"
    enc_nonlinear: Optional[str] = None
    window_fn: str = "hann"
    enc_onesided: bool = True
    enc_return_complex: bool = True
    sep_bottleneck_channels: int = 64
    sep_hidden_channels: int = 128
    sep_chunk_size: int = 100
    sep_hop_size: int = 50
    sep_num_blocks: int = 6
    sep_norm: bool = True
    mask_nonlinear: str = "sigmoid"
    causal: bool = True
    rnn_type: str = "lstm"
    # Serving profile: truly causal norms (time-major cLN instead of the
    # reference's future-leaking gLN/chunk-major cLN) + length-independent
    # padding, enabling EXACT chunk-by-chunk streaming
    # (models/streaming.py:ExactStreamingSeparator). Changes numerics vs the
    # reference's causal mode, which is not actually causal — see
    # models/dprnn.py docstrings.
    stream_safe: bool = False
    n_sources: int = 2
    eps: float = EPS
    in_channels: int = 1

    def setup(self):
        if self.stream_safe and not self.causal:
            raise ValueError("stream_safe=True requires causal=True")
        stride = self.stride or self.kernel_size // 2
        self._stride = stride
        encoder, decoder = choose_filterbank(
            self.n_basis, kernel_size=self.kernel_size, stride=stride,
            enc_basis=self.enc_basis, dec_basis=self.dec_basis,
            enc_nonlinear=self.enc_nonlinear, window_fn=self.window_fn,
            enc_onesided=self.enc_onesided, enc_return_complex=self.enc_return_complex,
            in_channels=self.in_channels,
        )
        self.encoder = encoder
        self.decoder = decoder
        self.separator = Separator(
            num_features=self.n_basis,
            bottleneck_channels=self.sep_bottleneck_channels,
            hidden_channels=self.sep_hidden_channels,
            chunk_size=self.sep_chunk_size,
            hop_size=self.sep_hop_size,
            num_blocks=self.sep_num_blocks,
            norm=self.sep_norm,
            mask_nonlinear=self.mask_nonlinear,
            causal=self.causal,
            rnn_type=self.rnn_type,
            stream_safe=self.stream_safe,
            n_sources=self.n_sources,
            eps=self.eps,
        )
