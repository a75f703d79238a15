"""BSS Eval metric tests (SDR/SIR/SAR + permutation)."""
import numpy as np

from dnn_based_source_separation_tpu.utils.bss import bss_eval_sources


def _sources(T=4000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((2, T)).astype(np.float64)


def test_perfect_estimates_have_huge_sdr():
    s = _sources()
    sdr, sir, sar, perm = bss_eval_sources(s, s, filt_len=32)
    assert np.all(sdr > 50)
    assert np.all(sir > 50)
    np.testing.assert_array_equal(perm, [0, 1])


def test_permuted_estimates_recovered():
    s = _sources(seed=1)
    sdr, sir, sar, perm = bss_eval_sources(s, s[::-1].copy(), filt_len=32)
    np.testing.assert_array_equal(perm, [1, 0])
    assert np.all(sdr > 50)


def test_interference_lowers_sir():
    s = _sources(seed=2)
    est = np.stack([s[0] + 0.5 * s[1], s[1]])
    sdr, sir, sar, perm = bss_eval_sources(s, est, filt_len=32)
    # ~ -20log10(0.5) = 6 dB SIR for source 0, huge for source 1.
    assert 4 < sir[0] < 8
    assert sir[1] > 40
    # SAR should stay high: interference is explainable by the references.
    assert sar[0] > 40


def test_filtered_reference_is_allowed():
    # A short FIR filtering of the target is "allowed distortion" in BSS
    # Eval; SDR must remain high when filt_len covers the filter.
    s = _sources(seed=3)
    fir = np.array([0.9, 0.05, -0.03, 0.02])
    est0 = np.convolve(s[0], fir)[: s.shape[1]]
    est = np.stack([est0, s[1]])
    sdr, sir, sar, perm = bss_eval_sources(s, est, filt_len=32)
    assert sdr[0] > 40


def test_matches_torch_free_reference_values():
    # Noise-corrupted estimate: SDR should be ~10log10(1/sigma^2).
    s = _sources(seed=4)
    rng = np.random.default_rng(5)
    noise = 0.1 * rng.standard_normal(s.shape[1])
    est = np.stack([s[0] + noise, s[1]])
    sdr, sir, sar, perm = bss_eval_sources(s, est, filt_len=32)
    assert 17 < sdr[0] < 23  # ~20 dB
