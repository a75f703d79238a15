"""Unit tests for the DSP core: windows, STFT/iSTFT, segment/OLA, norms.

Parity oracles: torch.stft/istft (the reference wraps these directly,
src/transforms/stft.py) and closed-form identities.
"""
import numpy as np
import pytest
import jax.numpy as jnp

import torch

from dnn_based_source_separation_tpu.ops import (
    build_window,
    build_optimal_window,
    stft,
    istft,
    segment,
    overlap_add,
    global_layer_norm,
    cumulative_layer_norm,
)
from dnn_based_source_separation_tpu.ops.segment import segment_padding


def test_hann_window_matches_torch():
    for n in [16, 64, 256]:
        ours = np.asarray(build_window(n, "hann"))
        ref = torch.hann_window(n, periodic=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_optimal_window_unit_overlap_add():
    # The optimal synthesis window times analysis window must overlap-add to 1.
    n_fft, hop = 64, 16
    w = build_window(n_fft, "hann")
    w_opt = build_optimal_window(w, hop)
    prod = np.asarray(w * w_opt)
    acc = np.zeros(n_fft + 10 * hop)
    for s in range(11):
        acc[s * hop : s * hop + n_fft] += prod
    # Interior (fully overlapped) region must be exactly 1.
    np.testing.assert_allclose(acc[n_fft : 10 * hop], 1.0, atol=1e-5)


@pytest.mark.parametrize("n_fft,hop", [(64, 16), (256, 64), (512, 128)])
def test_stft_matches_torch(n_fft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    w = np.asarray(build_window(n_fft, "hann"))

    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, window=jnp.asarray(w)))
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=torch.from_numpy(w),
        center=True, onesided=True, return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.parametrize("n_fft,hop", [(64, 16), (512, 128)])
def test_istft_roundtrip(n_fft, hop):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    w = build_window(n_fft, "hann")
    spec = stft(jnp.asarray(x), n_fft, hop, window=w)
    y = istft(spec, n_fft, hop, window=w, length=4000)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_istft_matches_torch():
    n_fft, hop = 256, 64
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3000)).astype(np.float32)
    w = np.asarray(build_window(n_fft, "hann"))
    spec_t = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=torch.from_numpy(w),
        center=True, onesided=True, return_complex=True,
    )
    ref = torch.istft(spec_t, n_fft, hop, window=torch.from_numpy(w), length=3000).numpy()
    ours = np.asarray(istft(jnp.asarray(spec_t.numpy()), n_fft, hop, window=jnp.asarray(w), length=3000))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_segment_overlap_add_identity():
    # With 50% overlap and a rectangular chunk, OLA(segment(x)) doubles the
    # interior samples (each appears in exactly 2 chunks).
    K, P = 16, 8
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 4)).astype(np.float32)  # (B, T, N)
    chunks = segment(jnp.asarray(x), K, P)
    assert chunks.shape == (2, (64 - K) // P + 1, K, 4)
    y = np.asarray(overlap_add(chunks, P))
    np.testing.assert_allclose(y[:, K : 64 - K + P], 2.0 * x[:, K : 64 - K + P], atol=1e-5)


def test_segment_padding_grid():
    for T in [100, 128, 137, 250]:
        K, P = 20, 10
        left, right = segment_padding(T, K, P)
        Tp = T + left + right
        assert (Tp - K) % P == 0
        # round trip through segment keeps shape
        x = jnp.zeros((1, Tp, 3))
        segment(x, K, P)


def test_global_layer_norm_matches_torch_groupnorm():
    # Reference gLN == GroupNorm(1, C) over (B, C, T) (src/modules/norm.py:11).
    B, T, N = 3, 50, 8
    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, T, N)).astype(np.float32)
    gamma = rng.standard_normal(N).astype(np.float32)
    beta = rng.standard_normal(N).astype(np.float32)

    ours = np.asarray(global_layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), eps=1e-8))

    gn = torch.nn.GroupNorm(1, N, eps=1e-8)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gamma))
        gn.bias.copy_(torch.from_numpy(beta))
    ref = gn(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_cumulative_layer_norm_causal():
    # Stats at frame t must only depend on frames <= t.
    B, T, N = 2, 30, 4
    rng = np.random.default_rng(5)
    x = rng.standard_normal((B, T, N)).astype(np.float32)
    gamma = np.ones(N, dtype=np.float32)
    beta = np.zeros(N, dtype=np.float32)
    full = np.asarray(cumulative_layer_norm(jnp.asarray(x), gamma, beta))
    x2 = x.copy()
    x2[:, 20:] = 999.0  # perturb the future
    pert = np.asarray(cumulative_layer_norm(jnp.asarray(x2), gamma, beta))
    np.testing.assert_allclose(full[:, :20], pert[:, :20], atol=1e-5)

    # And the t = T-1 frame matches a plain layer norm over all (T, N).
    last = full[:, -1]
    mu = x.reshape(B, -1).mean(axis=1, keepdims=True)
    sd = x.reshape(B, -1).std(axis=1, keepdims=True)
    expected = (x[:, -1] - mu) / np.sqrt(sd**2 + 1e-8)
    np.testing.assert_allclose(last, expected, atol=1e-4)
