"""wsj0-mix style wave datasets (list-file driven, segmenting).

Capability parity: reference `egs/wsj0-mix/common/src/dataset.py:13-250`:
  * WaveTrainDataset -- fixed-length windows with 50% overlap over each
    utterance (`dataset.py:40-65`);
  * WaveEvalDataset -- first max_samples of each utterance;
  * WaveTestDataset -- full utterances plus segment IDs for reporting.

Directory layout (same as the corpus prep scripts): wav_root/mix/<id>.wav,
wav_root/s1/<id>.wav ... wav_root/s<n>/<id>.wav. The list file carries one
utterance id per line (first whitespace token; '.wav' suffix optional).

TPU note: training windows are all the same length -> static shapes; eval
pads each utterance up to max_samples with a validity count so long-form
metrics can unpad on the host.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from .audio_io import read_wav


def _read_list(list_path: str) -> List[str]:
    ids = []
    with open(list_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            utt = line.split()[0]
            if utt.endswith(".wav"):
                utt = utt[:-4]
            ids.append(os.path.basename(utt))
    return ids


def _wav_length(path: str) -> int:
    # Fast length probe via scipy's mmap'd reader.
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from scipy.io import wavfile

        sr, data = wavfile.read(path, mmap=True)
    return int(data.shape[0])


class _WaveDatasetBase:
    def __init__(self, wav_root: str, list_path: str, n_sources: int = 2):
        self.wav_root = wav_root
        self.n_sources = n_sources
        self.utt_ids = _read_list(list_path)

    def _paths(self, utt_id: str) -> Tuple[str, List[str]]:
        mix = os.path.join(self.wav_root, "mix", utt_id + ".wav")
        srcs = [
            os.path.join(self.wav_root, f"s{idx + 1}", utt_id + ".wav")
            for idx in range(self.n_sources)
        ]
        return mix, srcs

    def _load(self, utt_id: str, start: int = 0, frames: int | None = None):
        mix_path, src_paths = self._paths(utt_id)
        mixture, _ = read_wav(mix_path, start, frames)
        sources = [read_wav(p, start, frames)[0] for p in src_paths]
        return mixture, np.stack(sources)


class WaveTrainDataset(_WaveDatasetBase):
    """Fixed windows of `samples` with hop `samples - overlap` (default 50%)."""

    def __init__(
        self,
        wav_root: str,
        list_path: str,
        samples: int = 32000,
        overlap: int | None = None,
        n_sources: int = 2,
    ):
        super().__init__(wav_root, list_path, n_sources)
        self.samples = samples
        self.overlap = samples // 2 if overlap is None else overlap
        hop = samples - self.overlap
        self.index: List[Tuple[str, int]] = []
        for utt in self.utt_ids:
            mix_path, _ = self._paths(utt)
            T = _wav_length(mix_path)
            for start in range(0, T - samples + 1, hop):
                self.index.append((utt, start))

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx):
        utt, start = self.index[idx]
        mixture, sources = self._load(utt, start, self.samples)
        return mixture[None, :].astype(np.float32), sources.astype(np.float32)


class WaveEvalDataset(_WaveDatasetBase):
    """First max_samples of each utterance, zero-padded to a static shape."""

    def __init__(self, wav_root: str, list_path: str, max_samples: int = 64000, n_sources: int = 2):
        super().__init__(wav_root, list_path, n_sources)
        self.max_samples = max_samples

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx):
        utt = self.utt_ids[idx]
        mixture, sources = self._load(utt, 0, None)
        T = min(mixture.shape[-1], self.max_samples)
        mix = np.zeros((1, self.max_samples), np.float32)
        src = np.zeros((self.n_sources, self.max_samples), np.float32)
        mix[0, :T] = mixture[:T]
        src[:, :T] = sources[:, :T]
        return mix, src


class WaveTestDataset(_WaveDatasetBase):
    """Full utterances with IDs (batch size 1, like the reference tester)."""

    def __len__(self):
        return len(self.utt_ids)

    def __getitem__(self, idx):
        utt = self.utt_ids[idx]
        mixture, sources = self._load(utt, 0, None)
        return utt, mixture[None, :].astype(np.float32), sources.astype(np.float32)
