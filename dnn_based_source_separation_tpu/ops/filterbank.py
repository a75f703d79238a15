"""Learned / Fourier analysis-synthesis filterbanks (TasNet encoder/decoder).

Capability parity: reference `src/models/filterbank.py` (Encoder:205,
Decoder:237, FourierEncoder:12, FourierDecoder:105, PinvDecoder:253,
GatedEncoder:325) and the factory `src/utils/filterbank.py:5-67`.

TPU-first design: a stride-S kernel-L Conv1d over one input channel IS
"frame into (B, T', L) then matmul L->N" -- so both encoder and decoder are
expressed as a single large matmul feeding the MXU (plus a fold for the
decoder's overlap-add), instead of translating torch's im2col conv. All
latents are channels-last (B, T', N).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .stft import _fold
from .windows import build_window, build_optimal_window

EPS = 1e-12


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., T', frame_length), T' = (T - L)//hop + 1.

    TPU note: when hop divides frame_length the framing is a pure
    reshape+slice+concat (ratio static small loop) -- gathers are slow on
    TPU, and every TasNet recipe satisfies L % hop == 0.
    """
    T = x.shape[-1]
    n_frames = (T - frame_length) // hop + 1
    if frame_length % hop == 0 and T % hop == 0:
        ratio = frame_length // hop
        blocks = x.reshape(*x.shape[:-1], T // hop, hop)
        parts = [blocks[..., k : k + n_frames, :] for k in range(ratio)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def unfold_apply(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Inverse of frame_signal by summation: (..., T', L) -> (..., T)."""
    *lead, S, L = frames.shape
    total = (S - 1) * hop + L
    return _fold(frames, hop, total)


class ConvEncoder(nn.Module):
    """Trainable analysis filterbank (reference Encoder:205).

    Input (B, T, C_in) -> latent (B, T', n_basis). Also exposes
    `pinv_decode`, the pseudo-inverse synthesis of reference PinvDecoder:253,
    sharing this module's kernel parameter.
    """

    n_basis: int
    kernel_size: int
    stride: int
    in_channels: int = 1
    nonlinear: Optional[str] = None

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_channels * self.kernel_size, self.n_basis),
        )

    def __call__(self, x):
        B, T, C = x.shape
        frames = frame_signal(jnp.moveaxis(x, -1, -2), self.kernel_size, self.stride)
        # (B, C, T', L) -> (B, T', C*L)
        frames = jnp.moveaxis(frames, 1, 2).reshape(B, -1, C * self.kernel_size)
        y = jnp.dot(frames, self.kernel, preferred_element_type=None)
        if self.nonlinear == "relu":
            y = nn.relu(y)
        elif self.nonlinear is not None:
            raise ValueError(f"Unsupported encoder nonlinearity: {self.nonlinear}")
        return y

    def pinv_decode(self, w_hat):
        """Least-squares synthesis via pinv of the analysis basis.

        w_hat: (..., T', n_basis) -> (..., T, 1). Requires n_basis >= L and
        monaural input (reference PinvDecoder:253-280 imposes the same).
        """
        if self.nonlinear is not None:
            raise ValueError("pinv of 'Conv1d + nonlinear' is unsupported")
        duplicate = self.kernel_size // self.stride
        # Analysis operator A = kernel.T (N, L); synthesis frames use pinv(A).
        pinv = jnp.linalg.pinv(self.kernel.T) / duplicate  # (L, N)
        frames = jnp.dot(w_hat, pinv.T, preferred_element_type=None)
        y = unfold_apply(frames, self.stride)
        return y[..., None]


class ConvDecoder(nn.Module):
    """Trainable synthesis filterbank / transposed conv (reference Decoder:237).

    Latent (..., T', n_basis) -> signal (..., T, out_channels).
    """

    n_basis: int
    kernel_size: int
    stride: int
    out_channels: int = 1

    @nn.compact
    def __call__(self, w_hat):
        *lead, S, N = w_hat.shape
        wk = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (N, self.out_channels * self.kernel_size),
        )
        frames = jnp.dot(w_hat, wk, preferred_element_type=None)
        frames = frames.reshape(*lead, S, self.out_channels, self.kernel_size)
        frames = jnp.moveaxis(frames, -2, -3)  # (..., C_out, S, L)
        y = unfold_apply(frames, self.stride)  # (..., C_out, T)
        return jnp.moveaxis(y, -2, -1)  # (..., T, C_out)


def _fourier_basis(frequency, time_seq, phase=None, onesided=True, n_basis=None):
    """Return (real, imag) basis rows (n_rows, L) from frequency params.

    Mirrors reference FourierEncoder.get_basis (filterbank.py:84-106): rows
    are cos(-omega n - phi), sin(-omega n - phi); for twosided output the
    interior bins are mirrored with conjugation.
    """
    omega_n = frequency[:, None] * time_seq[None, :]
    if phase is not None:
        omega_n = omega_n + phase[:, None]
    real, imag = jnp.cos(-omega_n), jnp.sin(-omega_n)
    if not onesided:
        interior_r = jnp.flip(real[1:-1], axis=0)
        interior_i = jnp.flip(imag[1:-1], axis=0)
        real = jnp.concatenate([real, interior_r], axis=0)
        imag = jnp.concatenate([imag, -interior_i], axis=0)
    return real, imag


class FourierEncoder(nn.Module):
    """Fixed/trainable Fourier analysis filterbank (reference :12-106).

    Input (B, T, 1) -> (B, T', F) complex if return_complex else (B, T', 2F)
    with layout [all real bins, all imag bins] matching the reference.
    """

    n_basis: int
    kernel_size: int
    stride: int
    window_fn: str = "hann"
    trainable: bool = False
    trainable_phase: bool = False
    onesided: bool = True
    return_complex: bool = True

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == 1, "Fourier filterbanks are monaural"
        omega0 = 2.0 * np.pi * np.arange(self.n_basis // 2 + 1) / self.n_basis
        if self.trainable:
            frequency = self.param("frequency", lambda k: jnp.asarray(omega0, jnp.float32))
        else:
            frequency = jnp.asarray(omega0, dtype=jnp.float32)
        window = self.param(
            "window", lambda k: build_window(self.kernel_size, self.window_fn)
        )
        phase = None
        if self.trainable_phase:
            phase = self.param(
                "phase", nn.initializers.zeros, (self.n_basis // 2 + 1,)
            )
        n = jnp.arange(self.kernel_size, dtype=jnp.float32)
        real, imag = _fourier_basis(frequency, n, phase, self.onesided)
        real, imag = window * real, window * imag

        frames = frame_signal(x[..., 0], self.kernel_size, self.stride)  # (B, T', L)
        out_r = jnp.dot(frames, real.T, preferred_element_type=None)
        out_i = jnp.dot(frames, imag.T, preferred_element_type=None)
        if self.return_complex:
            return out_r + 1j * out_i
        return jnp.concatenate([out_r, out_i], axis=-1)


class FourierDecoder(nn.Module):
    """Fourier synthesis filterbank with optimal window (reference :105-198)."""

    n_basis: int
    kernel_size: int
    stride: int
    window_fn: str = "hann"
    trainable: bool = False
    trainable_phase: bool = False
    onesided: bool = True

    @nn.compact
    def __call__(self, w_hat):
        omega0 = 2.0 * np.pi * np.arange(self.n_basis // 2 + 1) / self.n_basis
        if self.trainable:
            frequency = self.param("frequency", lambda k: jnp.asarray(omega0, jnp.float32))
        else:
            frequency = jnp.asarray(omega0, dtype=jnp.float32)
        window = build_window(self.kernel_size, self.window_fn)
        optimal = self.param(
            "optimal_window", lambda k: build_optimal_window(window, self.stride)
        )
        n = jnp.arange(self.kernel_size, dtype=jnp.float32)
        # Synthesis basis with POSITIVE phase cos/sin (reference
        # FourierDecoder.forward), always mirrored to the full n_basis rows
        # (interior conjugates carry -sin).
        omega_n = frequency[:, None] * n[None, :]
        if self.trainable_phase:
            phase = self.param("phase", nn.initializers.zeros, (self.n_basis // 2 + 1,))
            omega_n = omega_n + phase[:, None]
        real, imag = jnp.cos(omega_n), jnp.sin(omega_n)
        real = jnp.concatenate([real, jnp.flip(real[1:-1], axis=0)], axis=0)
        imag = jnp.concatenate([imag, -jnp.flip(imag[1:-1], axis=0)], axis=0)
        real = optimal * real / self.n_basis
        imag = optimal * imag / self.n_basis

        if jnp.iscomplexobj(w_hat):
            wr, wi = w_hat.real, w_hat.imag
        else:
            n_bins = w_hat.shape[-1]
            wr, wi = w_hat[..., : n_bins // 2], w_hat[..., n_bins // 2 :]

        if self.onesided:
            # Mirror the interior bins (conjugate symmetry of real signals).
            wr = jnp.concatenate([wr, jnp.flip(wr[..., 1:-1], axis=-1)], axis=-1)
            wi = jnp.concatenate([wi, -jnp.flip(wi[..., 1:-1], axis=-1)], axis=-1)

        # conv_transpose == per-frame synthesis matmul + overlap-add fold.
        frames = (
            jnp.dot(wr, real, preferred_element_type=None)
            - jnp.dot(wi, imag, preferred_element_type=None)
        )  # (..., T', L)
        y = unfold_apply(frames, self.stride)
        return y[..., None]  # (..., T, 1)


class GatedEncoder(nn.Module):
    """Gated filterbank of the original TasNet (reference :325-346)."""

    n_basis: int
    kernel_size: int
    stride: int
    in_channels: int = 1
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        # L2-normalize each utterance over time (per channel).
        norm = jnp.linalg.norm(x, axis=-2, keepdims=True)
        x = x / (norm + self.eps)
        B, T, C = x.shape
        frames = frame_signal(jnp.moveaxis(x, -1, -2), self.kernel_size, self.stride)
        frames = jnp.moveaxis(frames, 1, 2).reshape(B, -1, C * self.kernel_size)
        wU = self.param("kernel_U", nn.initializers.lecun_normal(), (C * self.kernel_size, self.n_basis))
        wV = self.param("kernel_V", nn.initializers.lecun_normal(), (C * self.kernel_size, self.n_basis))
        u = jnp.dot(frames, wU, preferred_element_type=None)
        v = jnp.dot(frames, wV, preferred_element_type=None)
        return nn.relu(u) * nn.sigmoid(v)


def compute_valid_basis(hidden_channels: int, onesided: bool = True, return_complex: bool = True) -> int:
    """Mirror of reference `src/utils/filterbank.py:52-67`."""
    if onesided:
        if return_complex:
            assert hidden_channels % 2 == 1, "`hidden_channels` is expected odd."
            return 2 * (hidden_channels - 1)
        assert hidden_channels % 2 == 0, "`hidden_channels` is expected even."
        return 2 * (hidden_channels // 2 - 1)
    if return_complex:
        return hidden_channels
    assert hidden_channels % 2 == 0, "`hidden_channels` is expected even."
    return hidden_channels // 2


def choose_filterbank(
    hidden_channels: int,
    kernel_size: int,
    stride: int | None = None,
    enc_basis: str = "trainable",
    dec_basis: str = "trainable",
    **kwargs,
):
    """Factory mapping basis strings to (encoder, decoder) flax modules.

    Mirrors reference `src/utils/filterbank.py:5-46`.
    """
    in_channels = kwargs.get("in_channels") or 1
    stride = stride or kernel_size // 2

    if enc_basis == "trainable":
        nonlinear = None if dec_basis == "pinv" else kwargs.get("enc_nonlinear")
        encoder = ConvEncoder(hidden_channels, kernel_size, stride, in_channels=in_channels, nonlinear=nonlinear)
    elif enc_basis in ("Fourier", "trainableFourier", "trainableFourierTrainablePhase"):
        assert in_channels == 1
        onesided = bool(kwargs.get("enc_onesided", True))
        return_complex = bool(kwargs.get("enc_return_complex", True))
        n_basis = compute_valid_basis(hidden_channels, onesided, return_complex)
        encoder = FourierEncoder(
            n_basis, kernel_size, stride, window_fn=kwargs.get("window_fn", "hann"),
            trainable=enc_basis != "Fourier",
            trainable_phase=enc_basis == "trainableFourierTrainablePhase",
            onesided=onesided, return_complex=return_complex,
        )
    elif enc_basis == "trainableGated":
        encoder = GatedEncoder(hidden_channels, kernel_size, stride, in_channels=in_channels)
    else:
        raise NotImplementedError(f"Unsupported encoder basis: {enc_basis}")

    if dec_basis == "trainable":
        decoder = ConvDecoder(hidden_channels, kernel_size, stride, out_channels=in_channels)
    elif dec_basis in ("Fourier", "trainableFourier", "trainableFourierTrainablePhase"):
        assert in_channels == 1
        onesided = bool(kwargs.get("enc_onesided", True))
        return_complex = bool(kwargs.get("enc_return_complex", True))
        n_basis = compute_valid_basis(hidden_channels, onesided, return_complex)
        decoder = FourierDecoder(
            n_basis, kernel_size, stride, window_fn=kwargs.get("window_fn", "hann"),
            trainable=dec_basis != "Fourier",
            trainable_phase=dec_basis == "trainableFourierTrainablePhase",
            onesided=onesided,
        )
    elif dec_basis == "pinv":
        assert in_channels == 1
        decoder = None  # synthesis rides encoder.pinv_decode (shared kernel)
    else:
        raise NotImplementedError(f"Unsupported decoder basis: {dec_basis}")

    return encoder, decoder
