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


def _split_ids(split):
    first, n, _ = _QUALITY_SPLITS[split]
    ranges = first if isinstance(first, tuple) else ((first, n),)
    ids = {i for f, cnt in ranges for i in range(f, f + cnt)}
    assert len(ids) == n
    return ids


def test_split_speaker_sets_disjoint():
    for train_split in ("tr", "tr_xl"):
        assert _split_ids(train_split) & _split_ids("tt") == set()
        assert _split_ids(train_split) & _split_ids("cv") == set()
    assert _split_ids("cv") & _split_ids("tt") == set()


def test_speaker_bank_prefix_stable_across_sizes():
    """tr_xl draws from a 120-speaker bank; the held-out tt speakers
    (ids 38-49) must be identical to the 50-speaker bank's, or the scaled
    corpus would silently change the test set."""
    small = _speaker_bank(50, seed=7)
    big = _speaker_bank(120, seed=7)
    for a, b in zip(small, big):
        assert a["f0"] == b["f0"]
        np.testing.assert_array_equal(a["formants"], b["formants"])


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


def test_musdb_quality_corpus_layout_and_disjointness(tmp_path):
    from dnn_based_source_separation_tpu.data.synthetic import (
        _MUSDB_QUALITY_SPLITS,
        _musdb_range,
        write_musdb_quality_corpus,
    )

    root = str(tmp_path)
    write_musdb_quality_corpus(root, n_train=2, n_valid=1, n_test=2,
                               track_sec=1.0, sample_rate=8000)

    # musdb18 layout: valid names live under train/ but are excluded from
    # the training subset; test/ is a separate directory + list.
    from dnn_based_source_separation_tpu.data import musdb18 as musdb

    tr = musdb._MUSDB18Base(root, subset="train")
    va = musdb._MUSDB18Base(root, subset="valid")
    te = musdb._MUSDB18Base(root, subset="test")
    assert len(tr.names) == 2 and len(va.names) == 1 and len(te.names) == 2
    assert not (set(tr.names) & set(va.names))
    assert not ((set(tr.names) | set(va.names)) & set(te.names))

    # mixture == sum of stems up to PCM16 quantization; stems are not silent
    ds = musdb.WaveTestDataset(root)
    for _, mix, refs in ds:
        assert refs.shape[0] == 4 and mix.shape[1:] == refs.shape[1:]
        err = np.abs(mix[0] - refs.sum(0)).max()
        assert err < 6.0 / 32767.0
        assert (np.abs(refs).max(axis=(1, 2)) > 0.01).all()

    # generator-parameter disjointness: shift=1 moves every U(lo,hi) window
    # past the training window
    _, shift_test = _MUSDB_QUALITY_SPLITS["test"]
    lo_t, hi_t = _musdb_range(55.0, 110.0, 0.0)
    lo_s, _ = _musdb_range(55.0, 110.0, shift_test)
    assert lo_s > hi_t

    # idempotent
    write_musdb_quality_corpus(root, n_train=2, n_valid=1, n_test=2,
                               track_sec=1.0, sample_rate=8000)
