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
separation error. For zero-deviation serving use `ExactStreamingSeparator`
below, which carries per-layer state (cLN running sums, dilated-conv left
contexts, encoder/decoder sample carries) and matches offline exactly.

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


class ExactStreamingSeparator:
    """Chunk-by-chunk causal Conv-TasNet that matches the offline forward
    EXACTLY (float rounding only), via per-layer state instead of a rolling
    window:

      * encoder framing — a (kernel_size - stride)-sample input carry, so
        chunked framing produces the same latent frames as one offline pass;
      * cumulative layer norm — running (count, sum, sum-of-squares) carried
        in a flax 'stream' collection (`ops/norms.py:CumulativeLayerNorm`);
      * dilated causal convs — each residual block carries its own
        (kernel-1)*dilation post-norm frames as left context
        (`models/tdcn.py:ResidualBlock1d`); zero initial state IS the
        offline zero padding;
      * decoder — overlap-add tail carry of (kernel_size - stride) samples.

    One jitted step per chunk shape: (params, state, samples) ->
    (estimates, state). Contrast `StreamingSeparator` above, whose windowed
    cLN only agrees with offline to ~23 dB; this is exact, so streamed
    serving has zero quality deviation from the offline model.

    Usage:
        stream = ExactStreamingSeparator(model, variables, hop_samples=4000)
        for block in blocks:            # (hop,) or (1, hop) float32
            est = stream.process(block) # (n_sources, emitted) -- emitted ==
                                        # hop once warmed up; the first call
                                        # withholds kernel_size - stride
                                        # samples, flush() returns them
    """

    def __init__(self, model, variables, hop_samples: int):
        if not getattr(model, "causal", False):
            raise ValueError("exact streaming requires a causal model")
        if getattr(model, "dec_basis", "trainable") == "pinv":
            raise NotImplementedError("pinv decoding is not streamed")
        if getattr(model, "enc_basis", "trainable") != "trainable":
            # trainableGated L2-normalizes over the WHOLE utterance
            # (ops/filterbank.py:GatedEncoder) — not frame-local, so no
            # chunked pass can match it; Fourier encoders take the complex
            # masking path the step below does not implement.
            raise NotImplementedError(
                "exact streaming supports enc_basis='trainable' (frame-"
                "local) encoders only")
        L = int(model.kernel_size)
        S = int(model.stride or model.kernel_size // 2)
        if hop_samples % S or hop_samples < L:
            raise ValueError(
                f"hop_samples must be a multiple of stride={S} and >= "
                f"kernel_size={L}")
        # Dual-path (chunked) separators: the mask stream lags the latent
        # stream by D = chunk_size - hop_size frames (an emitted frame's
        # chunk is complete only D frames later), so a D-frame latent delay
        # buffer realigns mask and latent, and the first D*S output samples
        # (the offline left pad's image) are trimmed.
        self._D = 0
        self._P = 1  # latent hop-grid quantum (frames per separator call)
        if hasattr(model, "sep_chunk_size"):
            if not hasattr(model, "rnn_type"):
                # Attention-based dual-path separators (DPTNet/SepFormer):
                # the reference's own causal mode applies NO causal mask to
                # the inter-chunk attention (src/models/dptnet.py:516 —
                # multihead_attn(x, x, x) over all S chunks), so every
                # emitted frame depends on the stream's entire future; and
                # even a causally-masked variant needs an O(stream) KV
                # cache, not the O(1) carried state this wrapper manages.
                # Measured: tests/test_streaming_dptnet.py (perturbing the
                # last 200 input samples moves the first 400 outputs by
                # ~0.27). See BENCHMARKS.md kernel notes.
                raise NotImplementedError(
                    "exact streaming is not defined for attention-based "
                    "dual-path separators: the reference-parity causal "
                    "DPTNet attends over future chunks (no causal mask in "
                    "the inter-chunk attention), and a masked variant "
                    "would need an unbounded KV cache; use causal "
                    "DPRNN-TasNet (stream_safe=True) for exact streaming")
            if not getattr(model, "stream_safe", False):
                raise NotImplementedError(
                    "exact streaming of a dual-path model requires "
                    "stream_safe=True: the reference-parity causal mode "
                    "reads future chunks through its norms (see "
                    "models/dprnn.py) and cannot be streamed")
            if model.rnn_type not in ("lstm", "gru"):
                raise NotImplementedError(
                    "exact dual-path streaming carries RNN state for "
                    "rnn_type 'lstm'/'gru' only")
            K, P = int(model.sep_chunk_size), int(model.sep_hop_size)
            self._D, self._P = K - P, P
            if (hop_samples - L) // S + 1 < P:
                raise ValueError(
                    f"hop_samples={hop_samples} yields fewer than "
                    f"hop_size={P} latent frames per call; raise it to at "
                    f"least {(P - 1) * S + L}")
        self.hop, self.L, self.S = int(hop_samples), L, S
        self.params = {"params": variables["params"]}
        self._model = model
        self._pending = np.zeros((1, 0), np.float32)  # unframed input samples
        self._tail = None  # decoder OLA carry, (n_src, L - S)
        self._w_delay = None  # latent delay buffer, (1, D + pend_frames, N)
        self._skip = 0  # head samples to trim (the left pad's image)
        self._state = None  # separator 'stream' collection
        self._steps = {}

        def _decode_ola(params, w_use, mask, tail):
            w_hat = w_use[:, None] * mask
            x_hat = self._model.apply(
                params, w_hat, method=lambda m, a: m.decoder(a))[..., 0]
            x_hat = x_hat[0]  # (n_src, (m_f-1)*S + L)
            n_out = x_hat.shape[-1] - (L - S)
            head = x_hat[..., : L - S] + tail
            emitted = jnp.concatenate([head, x_hat[..., L - S : n_out]], -1)
            new_tail = x_hat[..., n_out:]
            return emitted, new_tail

        def step(params, state, x, tail, w_delay):
            # x: (1, T_in) with (T_in - L) % S == 0; replicates
            # skeleton.extract_latent chunk-wise.
            xin = x[:, None, :]  # (B=1, C=1, T)
            xcl = jnp.moveaxis(xin, 1, 2)
            w = self._model.apply(
                params, xcl, method=lambda m, a: m.encoder(a))
            mask, mut = self._model.apply(
                {**params, "stream": state}, w,
                method=lambda m, a: m.separator(a), mutable=["stream"])
            w_avail = jnp.concatenate([w_delay, w], axis=1)
            m_f = mask.shape[2]  # == w frames unless the separator chunks
            emitted, new_tail = _decode_ola(
                params, w_avail[:, :m_f], mask, tail)
            return emitted, mut["stream"], new_tail, w_avail[:, m_f:]

        def final_step(params, state, x, tail, w_delay):
            # Chunked separators only: x carries the last r < hop_size
            # latent frames of samples (possibly none). The separator
            # right-pads them to the hop grid at the latent level (the
            # offline pr pad) and emits ALL remaining real mask frames —
            # exactly (K - P) + r, matching w_delay + the new frames.
            if x.shape[-1]:
                w = self._model.apply(
                    params, jnp.moveaxis(x[:, None, :], 1, 2),
                    method=lambda m, a: m.encoder(a))
            else:
                w = jnp.zeros((1, 0) + w_delay.shape[2:], w_delay.dtype)
            mask, mut = self._model.apply(
                {**params, "stream": state}, w,
                method=lambda m, a: m.separator(a), mutable=["stream"])
            w_avail = jnp.concatenate([w_delay, w], axis=1)
            assert mask.shape[2] == w_avail.shape[1], (
                "final emission must consume the whole latent stream",
                mask.shape, w_avail.shape)
            emitted, new_tail = _decode_ola(params, w_avail, mask, tail)
            return emitted, mut["stream"], new_tail

        # Public pure step: (params, state, x, tail, w_delay) -> (emitted,
        # state, tail, w_delay). Reused by the on-device latency bench
        # (lax.scan-able) so there is exactly one copy of the
        # exact-streaming semantics.
        self.step = step
        self._final = jax.jit(final_step)

    def _compiled(self, t_in: int):
        if t_in not in self._steps:
            self._steps[t_in] = jax.jit(self.step)
        return self._steps[t_in]

    def _prime(self, x):
        """Build the zeroed 'stream' state tree. `jax.eval_shape` traces the
        mutable apply abstractly — zero FLOPs, and flax's lazy variable-init
        double-run happens only on abstract values."""

        def state_tree(params, xin):
            w = self._model.apply(
                params, jnp.moveaxis(xin[:, None, :], 1, 2),
                method=lambda m, a: m.encoder(a))
            _, mut = self._model.apply(
                params, w, method=lambda m, a: m.separator(a),
                mutable=["stream"])
            return mut["stream"]

        shapes = jax.eval_shape(state_tree, self.params, x)
        self._state = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        n_src = int(self._model.n_sources)
        self._tail = jnp.zeros((n_src, self.L - self.S), jnp.float32)
        self._w_delay = jnp.zeros(
            (1, self._D, int(self._model.n_basis)), jnp.float32)
        self._skip = self._D * self.S

    def _run(self, x, t_in) -> np.ndarray:
        emitted, self._state, self._tail, self._w_delay = self._compiled(
            t_in)(self.params, self._state, x, self._tail, self._w_delay)
        emitted = np.asarray(emitted)
        if self._skip:  # head trim: the offline left pad's zero image
            cut = min(self._skip, emitted.shape[-1])
            emitted = emitted[..., cut:]
            self._skip -= cut
        return emitted

    def process(self, block: np.ndarray) -> np.ndarray:
        """block (hop,) or (1, hop) new samples -> (n_sources, emitted).

        For chunked (dual-path) models the emitted length varies around hop
        at the stream head (latent delay + hop-grid staging); concatenating
        all emissions + finish() reproduces the offline output exactly.
        """
        block = np.asarray(block, np.float32)
        if block.ndim == 1:
            block = block[None]
        assert block.shape[-1] == self.hop, (
            f"blocks must be exactly hop={self.hop} samples")
        buf = np.concatenate([self._pending, block], axis=-1)
        n_f = (buf.shape[-1] - self.L) // self.S + 1
        # Hop-grid alignment happens HERE, at the sample level, so every
        # stream-state array keeps a call-count-invariant shape (a latent
        # pending buffer inside the jitted state would change shape between
        # the first and later calls and break priming/compile reuse).
        n_use = (n_f // self._P) * self._P
        if n_use == 0:
            self._pending = buf
            return np.zeros((int(self._model.n_sources), 0), np.float32)
        t_in = (n_use - 1) * self.S + self.L
        x = jnp.asarray(buf[:, :t_in])
        self._pending = buf[:, n_use * self.S :]
        if self._state is None:
            self._prime(x)
        return self._run(x, t_in)

    def flush(self) -> np.ndarray:
        """Emit the final overlap-add tail (kernel_size - stride samples)."""
        out = np.asarray(self._tail) if self._tail is not None else \
            np.zeros((int(self._model.n_sources), self.L - self.S), np.float32)
        self._tail = jnp.zeros_like(self._tail) if self._tail is not None else None
        return out

    def finish(self, block: np.ndarray | None = None) -> np.ndarray:
        """End the stream with an arbitrary-length final block (may be
        shorter than hop), emitting everything that remains.

        Frames exactly the remaining samples — no zero-pad-to-hop at the
        SAMPLE level, whose extra frames would see real samples through
        their window and change the final kernel_size - stride output
        samples vs offline. The leftover pending + block must land on the
        stride grid ((total - L) % S == 0), as the offline pass's own
        padding does. For chunked (dual-path) separators any number of
        latent frames is fine: leftover frames off the hop grid are
        right-padded to one hop at the LATENT level inside the separator —
        exactly the offline pass's pr pad — and trimmed, so streamed ==
        offline for every stride-grid length.
        """
        parts = [self._pending]
        if block is not None:
            b = np.asarray(block, np.float32)
            parts.append(b[None] if b.ndim == 1 else b)
        buf = np.concatenate(parts, axis=-1)
        self._pending = np.zeros((1, 0), np.float32)
        pieces = []
        n_f = 0
        if buf.shape[-1] >= self.L:
            assert (buf.shape[-1] - self.L) % self.S == 0, (
                f"final block leaves {buf.shape[-1]} samples, off the "
                f"stride grid (L={self.L}, S={self.S})")
            n_f = (buf.shape[-1] - self.L) // self.S + 1
        n_full = (n_f // self._P) * self._P
        if n_full:
            t_in = (n_full - 1) * self.S + self.L
            x = jnp.asarray(buf[:, :t_in])
            if self._state is None:
                self._prime(x)
            pieces.append(self._run(x, t_in))
        if self._D:
            # Final separator call: the r < hop_size leftover frames are
            # right-padded to the hop grid at the LATENT level inside the
            # separator (the offline pr pad) and every remaining real mask
            # frame comes out in one shot.
            r = n_f - n_full
            if self._state is None:  # stream shorter than one hop
                self._prime(jnp.zeros(
                    (1, (self._P - 1) * self.S + self.L), jnp.float32))
            xr = (jnp.asarray(buf[:, n_full * self.S :]) if r
                  else jnp.zeros((1, 0), jnp.float32))
            emitted, self._state, self._tail = self._final(
                self.params, self._state, xr, self._tail, self._w_delay)
            self._w_delay = self._w_delay[:, :0]
            emitted = np.asarray(emitted)
            if self._skip:
                cut = min(self._skip, emitted.shape[-1])
                emitted = emitted[..., cut:]
                self._skip -= cut
            pieces.append(emitted)
        pieces.append(self.flush())
        return np.concatenate(pieces, axis=-1)

    def reset(self):
        """Restart the stream (state re-primed lazily on the next call)."""
        self._pending = np.zeros((1, 0), np.float32)
        self._state = None
        self._tail = None
        self._w_delay = None
        self._skip = 0
