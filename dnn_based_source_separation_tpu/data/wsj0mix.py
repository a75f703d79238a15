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
        if frames is not None:
            # Fixed-window hot path: one native threaded call reads the
            # mixture + all sources (data/native_loader.py). The native
            # reader only handles PCM16 WAVs — fall back to scipy for
            # anything else rather than failing the batch.
            from . import native_loader

            if native_loader.available():
                paths = [mix_path] + src_paths
                try:
                    batch = native_loader.read_segments_batch(
                        paths, [start] * len(paths), frames)
                    return batch[0], batch[1:]
                except (IOError, RuntimeError):
                    pass
        mixture, _ = read_wav(mix_path, start, frames)
        sources = [read_wav(p, start, frames)[0] for p in src_paths]
        return mixture, np.stack(sources)


class WaveTrainDataset(_WaveDatasetBase):
    """Fixed windows of `samples` with hop `samples - overlap` (default 50%).

    `cache_in_memory=True` keeps each utterance's decoded f32 waveforms
    (mixture + all sources) in RAM after first use, so epochs 2+ serve
    windows as pure numpy slices with zero file IO. Cost: ~4 bytes x
    (1 + n_sources) x total corpus samples (wsj0-2mix 8 kHz train set
    ~10 GB); measured on a 1-CPU host it removes a 40-80% loader-stall
    fraction from the sustained-training soak. Opt-in because the
    reference semantics (torchaudio.load per __getitem__,
    egs/wsj0-mix/common/src/dataset.py:40-65) re-read per window.
    """

    def __init__(
        self,
        wav_root: str,
        list_path: str,
        samples: int = 32000,
        overlap: int | None = None,
        n_sources: int = 2,
        cache_in_memory: bool = False,
    ):
        super().__init__(wav_root, list_path, n_sources)
        self.samples = samples
        self.overlap = samples // 2 if overlap is None else overlap
        self.cache_in_memory = cache_in_memory
        self._cache: dict = {}
        hop = samples - self.overlap
        self.index: List[Tuple[str, int]] = []
        for utt in self.utt_ids:
            mix_path, _ = self._paths(utt)
            T = _wav_length(mix_path)
            for start in range(0, T - samples + 1, hop):
                self.index.append((utt, start))

    def __len__(self):
        return len(self.index)

    def _load_window(self, utt: str, start: int):
        if not self.cache_in_memory:
            return self._load(utt, start, self.samples)
        hit = self._cache.get(utt)
        if hit is None:
            mix_path, src_paths = self._paths(utt)
            mix = read_wav(mix_path, 0, None)[0].astype(np.float32)
            srcs = np.stack(
                [read_wav(p, 0, None)[0] for p in src_paths]).astype(np.float32)
            hit = (mix, srcs)
            # dict set is atomic under the GIL; a concurrent duplicate read
            # just wastes one load.
            self._cache[utt] = hit
        mix, srcs = hit
        sl = slice(start, start + self.samples)
        return mix[sl], srcs[:, sl]

    def __getitem__(self, idx):
        utt, start = self.index[idx]
        mixture, sources = self._load_window(utt, start)
        return mixture[None, :].astype(np.float32), sources.astype(np.float32)


_WSJ_UTT_RE = None


def speaker_keys(utt_id: str, n_sources: int) -> List[str]:
    """Per-source speaker keys from a mixture utterance ID.

    Handles both list formats: wsj0-mix `<utt>_<gain>_<utt>_<gain>` pairs
    and LibriMix `<utt>_<utt>` (no gain fields). Keys collapse to the
    SPEAKER, not the utterance: wsj0 utterance codes (e.g. '011a0101')
    key by the 3-char speaker prefix, LibriSpeech codes
    ('103-1240-0000') by the leading speaker field. (The reference
    wavesplit adhoc_utils.py:3-14 keys by the full utterance token, which
    makes its embedding table scale with utterances instead of speakers —
    deliberately fixed here.)
    """
    global _WSJ_UTT_RE
    if _WSJ_UTT_RE is None:
        import re

        _WSJ_UTT_RE = re.compile(r"^[0-9]{3}[0-9a-z]{5}$")
    tokens = utt_id.split("_")
    if len(tokens) >= 2 * n_sources:
        toks = tokens[0::2][:n_sources]  # utt/gain pairs
    elif len(tokens) == n_sources:
        toks = tokens  # LibriMix style: utt tokens only
    else:
        raise ValueError(
            f"cannot parse {n_sources} speakers from utterance ID '{utt_id}'")
    keys = []
    for t in toks:
        if _WSJ_UTT_RE.match(t):
            keys.append(t[:3])  # wsj0 speaker prefix
        elif "-" in t:
            keys.append(t.split("-")[0])  # LibriSpeech speaker-chapter-utt
        else:
            keys.append(t)
    return keys


def create_spk_to_idx(list_path: str, n_sources: int = 2):
    """Speaker table from a wsj0-mix/LibriMix list file (reference wavesplit
    adhoc_utils.py:3-14): insertion order fixes the embedding-row index.
    """
    from ..utils.embedding import SpeakerToIndex

    spk_to_idx = SpeakerToIndex()
    for utt in _read_list(list_path):
        for spk in speaker_keys(utt, n_sources):
            spk_to_idx.add(spk)
    return spk_to_idx


class WaveTrainSpeakerDataset(WaveTrainDataset):
    """Train windows plus per-utterance speaker indices (reference wavesplit
    adhoc_dataset.py:8-25). Yields (mixture (1, T), sources (n_src, T),
    spk_idx (n_src,) int32).
    """

    def __init__(self, wav_root, list_path, samples=32000, overlap=None,
                 n_sources=2, spk_to_idx=None):
        super().__init__(wav_root, list_path, samples=samples, overlap=overlap,
                         n_sources=n_sources)
        self.spk_to_idx = (spk_to_idx if spk_to_idx is not None
                           else create_spk_to_idx(list_path, n_sources))

    def __getitem__(self, idx):
        mixture, sources = super().__getitem__(idx)
        utt, _ = self.index[idx]
        spk_idx = np.asarray(
            [self.spk_to_idx(s) for s in speaker_keys(utt, self.n_sources)],
            np.int32,
        )
        return mixture, sources, spk_idx


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


# -- spectrogram / ideal-mask datasets (DC / DANet / ADANet paths) ----------

def _np_stft(x: np.ndarray, n_fft: int, hop_length: int, window: np.ndarray) -> np.ndarray:
    """Host-side STFT matching ops.stft semantics (center reflect, onesided).

    x: (..., T) -> (..., n_bins, n_frames) complex64.
    """
    pad = n_fft // 2
    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    T = x.shape[-1]
    n_frames = (T - n_fft) // hop_length + 1
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = x[..., idx] * window
    spec = np.fft.rfft(frames, axis=-1).astype(np.complex64)
    return np.swapaxes(spec, -1, -2)


class SpectrogramTrainDataset(WaveTrainDataset):
    """Complex STFTs of fixed windows (reference dataset.py:177-210)."""

    def __init__(self, wav_root, list_path, n_fft, hop_length=None, window_fn="hann",
                 samples=32000, overlap=None, n_sources=2):
        super().__init__(wav_root, list_path, samples=samples, overlap=overlap, n_sources=n_sources)
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 2
        k = np.arange(n_fft)
        if window_fn == "hann":
            self.window = (0.5 - 0.5 * np.cos(2 * np.pi * k / n_fft)).astype(np.float32)
        else:
            self.window = np.ones(n_fft, np.float32)

    def __getitem__(self, idx):
        mixture, sources = super().__getitem__(idx)
        mix_spec = _np_stft(mixture, self.n_fft, self.hop_length, self.window)
        src_spec = _np_stft(sources, self.n_fft, self.hop_length, self.window)
        return mix_spec, src_spec


class IdealMaskSpectrogramTrainDataset(SpectrogramTrainDataset):
    """Adds ideal masks + threshold weights (reference dataset.py:211-250).

    Emits (|mixture| (1,F,Tf), |sources| (n,F,Tf), ideal_mask, threshold_weight).
    """

    def __init__(self, wav_root, list_path, n_fft, hop_length=None, window_fn="hann",
                 mask_type="ibm", threshold=40.0, samples=32000, overlap=None,
                 n_sources=2, eps=1e-12):
        super().__init__(wav_root, list_path, n_fft, hop_length, window_fn, samples, overlap, n_sources)
        self.mask_type = mask_type
        self.threshold = threshold
        self.eps = eps

    def __getitem__(self, idx):
        mix_spec, src_spec = super().__getitem__(idx)
        mix_amp = np.abs(mix_spec)
        src_amp = np.abs(src_spec)

        if self.mask_type == "ibm":
            max_idx = np.argmax(src_amp, axis=0)
            mask = np.eye(src_amp.shape[0], dtype=np.float32)[max_idx]
            mask = np.moveaxis(mask, -1, 0)
        elif self.mask_type == "irm":
            mask = src_amp / (src_amp.sum(axis=0) + self.eps)
        elif self.mask_type == "wfm":
            power = src_amp**2
            mask = power / (power.sum(axis=0) + self.eps)
        else:
            raise NotImplementedError(f"Unsupported mask: {self.mask_type}")

        log_amp = 20 * np.log10(mix_amp + self.eps)
        thr = 10 ** ((log_amp.max() - self.threshold) / 20)
        threshold_weight = (mix_amp > thr).astype(np.float32)
        return (
            mix_amp.astype(np.float32),
            src_amp.astype(np.float32),
            mask.astype(np.float32),
            threshold_weight,
        )


class WaveTrainVariableSourcesDataset(_WaveDatasetBase):
    """Variable #sources per utterance, padded + counts (ORPIT training).

    Replaces the reference's PackedSequence collate (dataset.py:490-683)
    with a zero-padded source axis + per-item count -- static shapes for
    the TPU (criterion.pit.orpit consumes exactly this form).
    """

    def __init__(self, wav_root, list_path, samples=32000, overlap=None,
                 max_sources=3, n_sources_per_utt=None):
        super().__init__(wav_root, list_path, n_sources=max_sources)
        self.samples = samples
        self.overlap = samples // 2 if overlap is None else overlap
        self.max_sources = max_sources
        self.counts = n_sources_per_utt or {}
        hop = samples - self.overlap
        self.index = []
        for utt in self.utt_ids:
            mix_path, _ = self._paths(utt)
            T = _wav_length(mix_path)
            for start in range(0, T - samples + 1, hop):
                self.index.append((utt, start))

    def _count(self, utt_id: str) -> int:
        if utt_id in self.counts:
            return self.counts[utt_id]
        # Probe which sN/ files exist.
        n = 0
        for idx in range(self.max_sources):
            path = os.path.join(self.wav_root, f"s{idx + 1}", utt_id + ".wav")
            if os.path.exists(path):
                n += 1
        return n

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx):
        utt, start = self.index[idx]
        n = self._count(utt)
        mixture, _ = read_wav(os.path.join(self.wav_root, "mix", utt + ".wav"), start, self.samples)
        sources = np.zeros((self.max_sources, self.samples), np.float32)
        for s in range(n):
            x, _ = read_wav(os.path.join(self.wav_root, f"s{s + 1}", utt + ".wav"), start, self.samples)
            sources[s, : x.shape[0]] = x
        return (
            mixture[None, :].astype(np.float32),
            sources,
            np.int32(n),
        )
