"""Held-out quality corpus: layout, split disjointness, mixing protocol.

The corpus backs QUALITY.md's held-out evaluation (reference protocol:
egs/wsj0-mix/README.md — tt speakers unseen during training).
"""
import numpy as np
import pytest

from dnn_based_source_separation_tpu.data.synthetic import (
    _QUALITY_SPLITS,
    _speaker_bank,
    synth_pseudo_speech,
    write_quality_corpus,
)


def test_split_speaker_sets_disjoint():
    ranges = {}
    for split, (first, n, _) in _QUALITY_SPLITS.items():
        ranges[split] = set(range(first, first + n))
    assert ranges["tr"] & ranges["tt"] == set()
    assert ranges["cv"] & ranges["tt"] == set()


def test_speaker_bank_deterministic_and_distinct():
    a = _speaker_bank(10, seed=7)
    b = _speaker_bank(10, seed=7)
    assert a[3]["f0"] == b[3]["f0"]
    f0s = [s["f0"] for s in a]
    assert len(set(f0s)) == len(f0s)


def test_synth_pseudo_speech_shape_and_range():
    spk = _speaker_bank(1, seed=0)[0]
    rng = np.random.default_rng(0)
    x = synth_pseudo_speech(spk, rng, 8000, 8000)
    assert x.shape == (8000,) and x.dtype == np.float32
    assert np.abs(x).max() <= 0.5 + 1e-6
    assert np.abs(x).max() > 0.1  # not silence


def test_corpus_layout_and_mixing(tmp_path):
    root = str(tmp_path)
    wav_root, list_path = write_quality_corpus(root, "tt", n_utts=3)
    from dnn_based_source_separation_tpu.data import WaveTestDataset

    ds = WaveTestDataset(wav_root, list_path, n_sources=2)
    items = list(ds)
    assert len(items) == 3
    for _, mix, srcs in items:
        assert srcs.shape[0] == 2 and mix.shape[-1] == srcs.shape[-1]
        # mixture == sum of sources up to PCM16 quantization
        err = np.abs(mix[0] - srcs.sum(0)).max()
        assert err < 3.0 / 32767.0
        # mixture SI-SDR floor is near 0 dB (sources at comparable level)
        alpha = (mix[0] * srcs).sum(-1, keepdims=True) / (srcs * srcs).sum(-1, keepdims=True)
        t = alpha * srcs
        floor = 10 * np.log10((t ** 2).sum(-1) / ((mix[0] - t) ** 2).sum(-1)).mean()
        assert -6.0 < floor < 6.0

    # idempotent: second call reuses the list
    wav_root2, list_path2 = write_quality_corpus(root, "tt", n_utts=3)
    assert list_path2 == list_path
