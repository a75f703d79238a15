"""Tester/Evaluater driver tests on synthetic data."""
import numpy as np
import jax

from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
from dnn_based_source_separation_tpu.models import ConvTasNet
from dnn_based_source_separation_tpu.train.tester import Evaluater, Tester, framewise_sdr


class _TinyTestSet:
    def __init__(self, n=2, T=1600):
        rng = np.random.default_rng(0)
        self.items = []
        for i in range(n):
            src = rng.standard_normal((2, T)).astype(np.float32)
            mix = src.sum(axis=0, keepdims=True)
            self.items.append((f"utt{i}", mix, src))

    def __iter__(self):
        return iter(self.items)


def test_tester_runs_and_reports(capsys):
    model = ConvTasNet(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=8, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, causal=False, n_sources=2,
    )
    ds = _TinyTestSet()
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, 1600), np.float32))
    tester = Tester(model, params, ds, PIT1d(NegSISDR(), n_sources=2), filt_len=16)
    summary = tester.run(verbose=True)
    captured = capsys.readouterr().out
    assert "Loss improvement" in captured
    assert np.isfinite(summary["loss"])
    assert np.isfinite(summary["sdr_improvement"])


def test_pad_to_default_is_exact_length():
    """pad_to=1 (default) must evaluate at exact utterance length: the
    forward pass sees the raw mixture, so gLN statistics are unperturbed
    and the reported metrics follow the reference protocol exactly."""
    import jax.numpy as jnp

    model = ConvTasNet(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=8, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, causal=False, n_sources=2,
    )
    T = 1603  # deliberately not a multiple of anything
    ds = _TinyTestSet(n=1, T=T)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, T), np.float32))

    tester = Tester(model, params, ds, PIT1d(NegSISDR(), n_sources=2), filt_len=16)
    assert tester.pad_to == 1
    summary_exact = tester.run(verbose=False)

    # Direct forward at exact length must reproduce the tester's loss.
    utt_id, mix, src = ds.items[0]
    est = model.apply(params, jnp.asarray(mix)[None])
    loss, _ = PIT1d(NegSISDR(), n_sources=2)(est, jnp.asarray(src)[None])
    assert abs(float(loss) - summary_exact["loss"]) < 1e-4


def test_pad_to_bucketing_deviation_is_bounded():
    """Quantify the gLN zero-padding deviation: bucketed evaluation is an
    approximation for non-causal models; assert it stays within 0.5 dB of
    the exact protocol on this tiny fixture so regressions are visible."""
    model = ConvTasNet(
        n_basis=16, kernel_size=8, stride=4, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=8, sep_bottleneck_channels=8, sep_skip_channels=8,
        sep_num_blocks=1, sep_num_layers=2, causal=False, n_sources=2,
    )
    T = 1500
    ds = _TinyTestSet(n=2, T=T)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, T), np.float32))
    crit = PIT1d(NegSISDR(), n_sources=2)

    exact = Tester(model, params, ds, crit, filt_len=16, pad_to=1).run(verbose=False)
    padded = Tester(model, params, ds, crit, filt_len=16, pad_to=1024).run(verbose=False)
    assert abs(exact["loss"] - padded["loss"]) < 0.5
    assert abs(exact["loss_improvement"] - padded["loss_improvement"]) < 0.5


def test_framewise_sdr_and_evaluater():
    rng = np.random.default_rng(1)
    T = 8000
    refs = rng.standard_normal((2, T))
    perfect = refs.copy()
    noisy = refs + 0.1 * rng.standard_normal((2, T))

    ev = Evaluater(sources=("a", "b"), sample_rate=4000, win=0.5, filt_len=8)
    ev.add_track(refs, perfect)
    ev.add_track(refs, noisy)
    table = ev.aggregate()
    assert table["a"] > 15 and table["b"] > 15

    s_perfect = framewise_sdr(refs, perfect, 4000, win=0.5, filt_len=8)
    s_noisy = framewise_sdr(refs, noisy, 4000, win=0.5, filt_len=8)
    assert np.all(s_perfect > s_noisy)
