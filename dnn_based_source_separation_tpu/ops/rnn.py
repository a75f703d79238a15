"""Recurrent primitives: LSTM/GRU/RNN with torch-compatible semantics.

Capability parity: reference `src/utils/model.py:22` (choose_rnn over
nn.RNN/LSTM/GRU). TPU-first design for the dual-path workloads
(DPRNN/DPTNet/UMX/LSTM-TasNet):

  * the input projection for ALL timesteps is one large (B*T, F) x (F, 4H)
    matmul hitting the MXU before the scan starts;
  * `lax.scan` then carries only the (B, H) recurrence, whose per-step
    (B, H) x (H, 4H) matmul is batched across B (dual-path chunking makes B
    large: B*S sequences of length K<=250, so the MXU stays fed);
  * gate order and parameter shapes mirror torch (i, f, g, o; w_ih (F, 4H))
    so pretrained-weight conversion is a pure transpose.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(xw: jnp.ndarray, w_hh: jnp.ndarray, hidden_size: int,
               init=None, return_final: bool = False):
    """xw: (B, T, 4H) precomputed input gates; returns hidden states (B, T, H).

    On real TPU the recurrence runs as the fused Pallas kernel
    (`ops/pallas_lstm.py`): w_hh and the h/c carry stay resident in VMEM for
    the whole sequence instead of re-launching a small matmul per step.
    `DNNTPU_PALLAS_LSTM=0` falls back to the lax.scan path below.

    `init` (h0, c0) + `return_final` support exact streaming: chunked
    application carries the recurrent state across calls (forces the scan
    path; the Pallas stepper assumes a zero carry).
    """
    from .pallas_lstm import lstm_scan as _fused, pallas_lstm_enabled

    if init is None and not return_final and pallas_lstm_enabled():
        return _fused(xw, w_hh, not jax.default_backend() == "tpu")
    B = xw.shape[0]
    H = hidden_size
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.dot(h, w_hh, preferred_element_type=None)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    if init is None:
        init = (jnp.zeros((B, H), xw.dtype), jnp.zeros((B, H), xw.dtype))
    final, hs = jax.lax.scan(step, init, xw_t)
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    return (hs, final) if return_final else hs


def _gru_scan(xw: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray, hidden_size: int,
              init=None, return_final: bool = False):
    """xw: (B, T, 3H) = x W_ih + b_ih; torch gate order r, z, n.

    `init`/`return_final` carry the hidden state for exact streaming.
    """
    B = xw.shape[0]
    H = hidden_size
    xw_t = jnp.swapaxes(xw, 0, 1)

    def step(h, xt):
        hw = jnp.dot(h, w_hh, preferred_element_type=None) + b_hh
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = nn.sigmoid(xr + hr)
        z = nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    if init is None:
        init = jnp.zeros((B, H), xw.dtype)
    final, hs = jax.lax.scan(step, init, xw_t)
    hs = jnp.swapaxes(hs, 0, 1)
    return (hs, final) if return_final else hs


def _rnn_scan(xw: jnp.ndarray, w_hh: jnp.ndarray, hidden_size: int):
    B = xw.shape[0]
    xw_t = jnp.swapaxes(xw, 0, 1)

    def step(h, xt):
        h = jnp.tanh(xt + jnp.dot(h, w_hh, preferred_element_type=None))
        return h, h

    _, hs = jax.lax.scan(step, jnp.zeros((B, hidden_size), xw.dtype), xw_t)
    return jnp.swapaxes(hs, 0, 1)


class LSTM(nn.Module):
    """(B, T, F) -> (B, T, D*H); D = 2 if bidirectional. Stacked layers.

    `dropout` follows torch nn.LSTM semantics: applied to each layer's
    output except the last, active only when `train=True` (requires a
    'dropout' rng in apply).
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    # Opt-out for chunk-LOCAL recurrences inside a streamed model (e.g. the
    # dual-path intra-chunk BiLSTM): their state must NOT carry across calls.
    stream_state: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .pallas_lstm import lstm_scan_bidir, pallas_lstm_enabled

        H = self.hidden_size
        # Exact streaming (mutable 'stream' collection): carry each layer's
        # final (h, c) across calls so chunked application equals one
        # offline pass. Unidirectional (causal) stacks only — a backward
        # chain cannot stream.
        streaming = (self.is_mutable_collection("stream")
                     and not self.is_initializing()
                     and self.stream_state)
        if streaming and self.bidirectional:
            raise NotImplementedError(
                "exact streaming requires a unidirectional (causal) LSTM")
        fuse_bidir = self.bidirectional and pallas_lstm_enabled()
        for layer in range(self.num_layers):
            F = x.shape[-1]
            params = []
            for direction in range(2 if self.bidirectional else 1):
                sfx = f"_l{layer}" + ("_reverse" if direction else "")
                w_ih = self.param(f"w_ih{sfx}", nn.initializers.lecun_normal(), (F, 4 * H))
                w_hh = self.param(f"w_hh{sfx}", nn.initializers.orthogonal(), (H, 4 * H))
                b = self.param(f"b{sfx}", nn.initializers.zeros, (4 * H,))
                params.append((w_ih, w_hh, b))
            if streaming:
                w_ih, w_hh, b = params[0]
                state = self.variable(
                    "stream", f"state_l{layer}",
                    lambda: jnp.zeros((x.shape[0], 2, H), x.dtype))
                xw = jnp.dot(x, w_ih, preferred_element_type=None) + b
                hs, (hT, cT) = _lstm_scan(
                    xw, w_hh, H,
                    init=(state.value[:, 0], state.value[:, 1]),
                    return_final=True)
                state.value = jnp.stack([hT, cT], axis=1)
                x = hs
            elif fuse_bidir:
                # Both directional recurrences advance in ONE fused Pallas
                # stepper; per-step cost is shared across the two chains.
                (wif, whf, bf), (wib, whb, bb) = params
                # Stream the recurrence IO in the parameter dtype: an f32
                # upcast upstream (e.g. LayerNorm) would otherwise double
                # the kernel's HBM traffic in bf16 models. Gate math is f32
                # inside the kernel either way.
                xw_f = (jnp.dot(x, wif, preferred_element_type=None) + bf).astype(wif.dtype)
                xw_b = (jnp.dot(jnp.flip(x, axis=1), wib, preferred_element_type=None) + bb).astype(wif.dtype)
                hs_f, hs_b = lstm_scan_bidir(
                    xw_f, xw_b, whf, whb, not jax.default_backend() == "tpu")
                x = jnp.concatenate([hs_f, jnp.flip(hs_b, axis=1)], axis=-1)
            else:
                outs = []
                for direction, (w_ih, w_hh, b) in enumerate(params):
                    xin = jnp.flip(x, axis=1) if direction else x
                    xw = jnp.dot(xin, w_ih, preferred_element_type=None) + b
                    hs = _lstm_scan(xw, w_hh, H)
                    outs.append(jnp.flip(hs, axis=1) if direction else hs)
                x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class GRU(nn.Module):
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    stream_state: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .pallas_lstm import gru_scan_bidir, pallas_lstm_enabled

        H = self.hidden_size
        streaming = (self.is_mutable_collection("stream")
                     and not self.is_initializing()
                     and self.stream_state)
        if streaming and self.bidirectional:
            raise NotImplementedError(
                "exact streaming requires a unidirectional (causal) GRU")
        fuse_bidir = self.bidirectional and pallas_lstm_enabled()
        for layer in range(self.num_layers):
            params = []
            for direction in range(2 if self.bidirectional else 1):
                sfx = f"_l{layer}" + ("_reverse" if direction else "")
                F = x.shape[-1]
                w_ih = self.param(f"w_ih{sfx}", nn.initializers.lecun_normal(), (F, 3 * H))
                w_hh = self.param(f"w_hh{sfx}", nn.initializers.orthogonal(), (H, 3 * H))
                b_ih = self.param(f"b_ih{sfx}", nn.initializers.zeros, (3 * H,))
                b_hh = self.param(f"b_hh{sfx}", nn.initializers.zeros, (3 * H,))
                params.append((w_ih, w_hh, b_ih, b_hh))
            if streaming:
                w_ih, w_hh, b_ih, b_hh = params[0]
                state = self.variable(
                    "stream", f"state_l{layer}",
                    lambda: jnp.zeros((x.shape[0], H), x.dtype))
                xw = jnp.dot(x, w_ih, preferred_element_type=None) + b_ih
                hs, hT = _gru_scan(xw, w_hh, b_hh, H, init=state.value,
                                   return_final=True)
                state.value = hT
                x = hs
            elif fuse_bidir:
                (wif, whf, bif, bhf), (wib, whb, bib, bhb) = params
                xw_f = (jnp.dot(x, wif, preferred_element_type=None) + bif).astype(wif.dtype)
                xw_b = (jnp.dot(jnp.flip(x, axis=1), wib, preferred_element_type=None) + bib).astype(wif.dtype)
                hs_f, hs_b = gru_scan_bidir(
                    xw_f, xw_b, whf, whb, bhf, bhb,
                    not jax.default_backend() == "tpu")
                x = jnp.concatenate([hs_f, jnp.flip(hs_b, axis=1)], axis=-1)
            else:
                outs = []
                for direction, (w_ih, w_hh, b_ih, b_hh) in enumerate(params):
                    xin = jnp.flip(x, axis=1) if direction else x
                    xw = jnp.dot(xin, w_ih, preferred_element_type=None) + b_ih
                    hs = _gru_scan(xw, w_hh, b_hh, H)
                    outs.append(jnp.flip(hs, axis=1) if direction else hs)
                x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


def _sru_linear_scan(f: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Solve c_t = f_t * c_{t-1} + z_t (c_0 = 0) with a parallel prefix scan.

    f, z: (B, T, H). Each timestep is the affine map c -> f_t*c + z_t;
    composing maps is associative, so `lax.associative_scan` evaluates the
    whole recurrence in O(log T) depth of elementwise ops -- there is no
    sequential dependency left for the hardware to wait on (contrast the
    ~14 us/step chain of an LSTM, BENCHMARKS.md kernel notes). The scan
    runs in float32: the prefix products of gates can underflow bf16.
    """
    dtype = z.dtype
    f32, z32 = f.astype(jnp.float32), z.astype(jnp.float32)

    def combine(a, b):
        fa, za = a
        fb, zb = b
        return fb * fa, fb * za + zb

    _, c = jax.lax.associative_scan(combine, (f32, z32), axis=1)
    return c.astype(dtype)


class SRU(nn.Module):
    """Simple Recurrent Unit (Lei et al. 2018, light recurrence) -- the
    TPU-first recurrence: elementwise-only state update, evaluated with a
    parallel prefix scan instead of a sequential loop.

        x~, f', r' = x W            (one (B*T, F) x (F, 3H) MXU matmul)
        f_t = sigmoid(f'_t + b_f)
        r_t = sigmoid(r'_t + b_r)
        c_t = f_t . c_{t-1} + (1 - f_t) . x~_t     <- associative scan
        h_t = r_t . c_t + (1 - r_t) . x_t          (highway)

    Unlike LSTM/GRU there is no h_{t-1} @ W_hh inside the step, so the
    recurrence has no matmul-latency chain: everything after the input
    projection is VPU-elementwise at O(log T) depth. This is an extension
    beyond the reference's rnn/lstm/gru surface (`src/utils/model.py:22`),
    offered as a drop-in `rnn_type` for the dual-path models where the
    LSTM dependency chain is the measured throughput ceiling
    (BENCHMARKS.md kernel notes; ROADMAP #4).

    The highway term uses x directly when F == H, otherwise a learned
    (F, H) projection. Same call contract as LSTM/GRU above.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    stream_state: bool = True  # accepted, unused: SRU has no exact-stream path

    @nn.compact
    def __call__(self, x, train: bool = False):
        H = self.hidden_size
        for layer in range(self.num_layers):
            F = x.shape[-1]
            outs = []
            for direction in range(2 if self.bidirectional else 1):
                sfx = f"_l{layer}" + ("_reverse" if direction else "")
                w = self.param(f"w_ih{sfx}", nn.initializers.lecun_normal(), (F, 3 * H))
                b = self.param(f"b{sfx}", nn.initializers.zeros, (2 * H,))
                xin = jnp.flip(x, axis=1) if direction else x
                u = jnp.dot(xin, w, preferred_element_type=None)
                xt, fp, rp = jnp.split(u, 3, axis=-1)
                bf, br = jnp.split(b, 2, axis=-1)
                f = nn.sigmoid(fp + bf)
                r = nn.sigmoid(rp + br)
                c = _sru_linear_scan(f, (1.0 - f) * xt)
                if F == H:
                    hw = xin
                else:
                    w_hx = self.param(
                        f"w_hx{sfx}", nn.initializers.lecun_normal(), (F, H))
                    hw = jnp.dot(xin, w_hx, preferred_element_type=None)
                hs = r * c + (1.0 - r) * hw
                outs.append(jnp.flip(hs, axis=1) if direction else hs)
            x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class RNN(nn.Module):
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    stream_state: bool = True  # accepted, unused: vanilla RNN is not streamed

    @nn.compact
    def __call__(self, x, train: bool = False):
        H = self.hidden_size
        for layer in range(self.num_layers):
            outs = []
            for direction in range(2 if self.bidirectional else 1):
                sfx = f"_l{layer}" + ("_reverse" if direction else "")
                F = x.shape[-1]
                w_ih = self.param(f"w_ih{sfx}", nn.initializers.lecun_normal(), (F, H))
                w_hh = self.param(f"w_hh{sfx}", nn.initializers.orthogonal(), (H, H))
                b = self.param(f"b{sfx}", nn.initializers.zeros, (H,))
                xin = jnp.flip(x, axis=1) if direction else x
                xw = jnp.dot(xin, w_ih, preferred_element_type=None) + b
                hs = _rnn_scan(xw, w_hh, H)
                outs.append(jnp.flip(hs, axis=1) if direction else hs)
            x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


def choose_rnn(name: str, hidden_size: int, num_layers: int = 1, bidirectional: bool = False, dropout: float = 0.0, parent_name: Optional[str] = None, stream_state: bool = True):
    """Factory mirroring reference `src/utils/model.py:22`."""
    table = {"rnn": RNN, "lstm": LSTM, "gru": GRU, "sru": SRU}
    if name not in table:
        raise NotImplementedError(f"Unsupported rnn type: {name}")
    return table[name](hidden_size=hidden_size, num_layers=num_layers, bidirectional=bidirectional, dropout=dropout, name=parent_name, stream_state=stream_state)
