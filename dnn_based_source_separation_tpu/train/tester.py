"""Testers/evaluaters: per-utterance metrics and museval-style aggregation.

Capability parity:
  * Tester -- reference `egs/wsj0-mix/common/src/driver.py:228-390`
    (TesterBase): per-utterance PIT loss, SI-SDR improvement vs the repeated
    mixture, BSS Eval SDRi/SIRi/SAR, optional PESQ subprocess, per-utterance
    CSV lines and final averages.
  * Evaluater -- reference `egs/musdb18/common/src/driver.py:276-338`
    (EvaluaterBase): framewise metrics aggregated median-over-frames then
    median-over-tracks (museval EvalStore semantics).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..criterion.sdr import sisdr
from ..data.audio_io import write_wav
from ..utils.bss import bss_eval_sources


class Tester:
    """wsj0-mix style tester over a WaveTestDataset-like iterable."""

    def __init__(
        self,
        model,
        params,
        dataset,
        pit_criterion: Callable,
        sample_rate: int = 8000,
        out_dir: Optional[str] = None,
        pesq_bin: Optional[str] = None,
        filt_len: int = 512,
        pad_to: int = 1,
    ):
        self.model, self.params = model, params
        self.dataset = dataset
        self.pit_criterion = pit_criterion
        self.sample_rate = sample_rate
        self.out_dir = out_dir
        self.pesq_bin = pesq_bin
        self.filt_len = filt_len
        # pad_to > 1 buckets utterance lengths to multiples of pad_to so jit
        # compiles a handful of programs instead of one per utterance length.
        # Zero-padding is NOT output-invariant for non-causal models whose
        # normalization statistics are global (gLN): the padded frames enter
        # the mean/variance, perturbing the truncated estimates. The default
        # (1 = exact length) matches the reference evaluation protocol; only
        # raise it for causal/cLN models (zero future input is invariant
        # there) or when a bounded metric deviation is acceptable
        # (tests/test_tester.py quantifies it).
        self.pad_to = pad_to
        self._forward = jax.jit(model.apply)

    def run(self, verbose: bool = True):
        """Returns dict of averaged metrics; prints per-utterance CSV."""
        results = {"loss": [], "loss_improvement": [], "sdr_improvement": [],
                   "sir_improvement": [], "sar": [], "pesq": []}
        if verbose:
            # PESQ* = in-tree calibrated P.862-style tool, not the certified
            # ITU binary (native/pesq/CALIBRATION.md); starred so readers
            # don't compare the column against published certified scores.
            print("ID, Loss, Loss improvement, SDR improvement, SIR improvement, SAR, PESQ*", flush=True)

        for utt_id, mixture, sources in self.dataset:
            T = mixture.shape[-1]
            pad = (-T) % self.pad_to
            mixture_p = np.pad(np.asarray(mixture), ((0, 0), (0, pad)))
            mixture_j = jnp.asarray(mixture_p)[None]  # (1, 1, T_padded)
            sources_j = jnp.asarray(sources)[None]  # (1, n_src, T)
            estimates = self._forward(self.params, mixture_j)[..., :T]
            mixture_j = mixture_j[..., :T]
            loss, _ = self.pit_criterion(estimates, sources_j)

            n_src = sources.shape[0]
            tiled = jnp.tile(mixture_j, (1, n_src, 1))
            loss_mix, _ = self.pit_criterion(tiled, sources_j)
            loss_improvement = float(loss_mix) - float(loss)  # SI-SDRi for NegSISDR

            est_np = np.asarray(estimates[0])
            src_np = np.asarray(sources)
            mix_np = np.tile(np.asarray(mixture), (n_src, 1))
            sdr, sir, sar, perm = bss_eval_sources(src_np, est_np, filt_len=self.filt_len)
            sdr0, sir0, _, _ = bss_eval_sources(src_np, mix_np, filt_len=self.filt_len)
            sdr_i, sir_i = float(np.mean(sdr - sdr0)), float(np.mean(sir - sir0))

            pesq_score = self._pesq(src_np, est_np, perm) if self.pesq_bin else float("nan")

            results["loss"].append(float(loss))
            results["loss_improvement"].append(loss_improvement)
            results["sdr_improvement"].append(sdr_i)
            results["sir_improvement"].append(sir_i)
            results["sar"].append(float(np.mean(sar)))
            results["pesq"].append(pesq_score)
            if verbose:
                print(
                    f"{utt_id}, {float(loss):.3f}, {loss_improvement:.3f}, "
                    f"{sdr_i:.3f}, {sir_i:.3f}, {float(np.mean(sar)):.3f}, {pesq_score:.3f}",
                    flush=True,
                )
            if self.out_dir:
                self._dump(utt_id, np.asarray(mixture), est_np)

        summary = {}
        for k, v in results.items():
            arr = np.asarray(v, dtype=float)
            valid = arr.size and not np.all(np.isnan(arr))
            summary[k] = float(np.nanmean(arr)) if valid else float("nan")
        if verbose:
            print(
                f"Loss: {summary['loss']:.3f}, Loss improvement: {summary['loss_improvement']:.3f}, "
                f"SDR improvement: {summary['sdr_improvement']:.3f}, "
                f"SIR improvement: {summary['sir_improvement']:.3f}, "
                f"SAR: {summary['sar']:.3f}, PESQ*: {summary['pesq']:.3f}",
                flush=True,
            )
        return summary

    def _pesq(self, references: np.ndarray, estimates: np.ndarray, perm) -> float:
        """PESQ via subprocess CLI; failures score the floor -0.5
        (reference driver.py:359-362)."""
        from ..utils.audio import evaluate_pesq

        scores = []
        tmp = tempfile.mkdtemp()
        try:
            for j, p in enumerate(perm):
                ref_path = os.path.join(tmp, f"ref{j}.wav")
                est_path = os.path.join(tmp, f"est{j}.wav")
                ref = references[p] / (np.abs(references[p]).max() + 1e-9)
                est = estimates[j] / (np.abs(estimates[j]).max() + 1e-9)
                write_wav(ref_path, ref, self.sample_rate)
                write_wav(est_path, est, self.sample_rate)
                try:
                    scores.append(evaluate_pesq(self.pesq_bin, ref_path, est_path, self.sample_rate))
                except (subprocess.CalledProcessError, RuntimeError, OSError):
                    scores.append(-0.5)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return float(np.mean(scores))

    def _dump(self, utt_id, mixture, estimates):
        out = os.path.join(self.out_dir, utt_id)
        os.makedirs(out, exist_ok=True)
        mix = mixture.reshape(-1)
        write_wav(os.path.join(out, "mixture.wav"), mix / (np.abs(mix).max() + 1e-9), self.sample_rate)
        for s in range(estimates.shape[0]):
            est = estimates[s] / (np.abs(estimates[s]).max() + 1e-9)
            write_wav(os.path.join(out, f"source{s}.wav"), est, self.sample_rate)


def framewise_sdr(references: np.ndarray, estimates: np.ndarray, sample_rate: int,
                  win: float = 1.0, filt_len: int = 512):
    """Per-source framewise SDR, median over frames (museval-style).

    references/estimates: (n_src, T). Frames shorter than win are dropped.
    """
    T = references.shape[1]
    frame = int(win * sample_rate)
    sdrs = []
    for start in range(0, T - frame + 1, frame):
        ref = references[:, start : start + frame]
        est = estimates[:, start : start + frame]
        if np.all(np.sum(ref**2, axis=1) > 0):
            sdr, _, _, _ = bss_eval_sources(ref, est, compute_permutation=False, filt_len=filt_len)
            sdrs.append(sdr)
    if not sdrs:
        return np.full(references.shape[0], np.nan)
    return np.nanmedian(np.stack(sdrs), axis=0)


class Evaluater:
    """musdb18-style museval v4 evaluation.

    Per track: BSS Eval v4 (global 512-tap filters, framewise 1 s
    SDR/ISR/SIR/SAR energy ratios), median over frames; then median over
    tracks -- museval `EvalStore(frames_agg='median', tracks_agg='median')`
    semantics (reference egs/musdb18/common/src/driver.py:301-330).
    Stereo (n_src, T, C) inputs are evaluated as images; mono (n_src, T)
    as single-channel images.
    """

    METRICS = ("SDR", "ISR", "SIR", "SAR")

    def __init__(self, sources=("bass", "drums", "other", "vocals"), sample_rate: int = 44100,
                 win: float = 1.0, hop: float = 1.0, filt_len: int = 512):
        self.sources = list(sources)
        self.sample_rate = sample_rate
        self.win = win
        self.hop = hop
        self.filt_len = filt_len
        self.track_scores = []  # list of (n_src, 4) frame-medians

    def add_track(self, references: np.ndarray, estimates: np.ndarray):
        """references/estimates: (n_src, T) mono or (n_src, T, C) images."""
        from ..utils.bss import bss_eval_v4

        framewise = bss_eval_v4(
            references, estimates, self.sample_rate,
            win=self.win, hop=self.hop, filt_len=self.filt_len,
        )
        per_src = np.stack(
            [np.nanmedian(framewise[m], axis=1) for m in self.METRICS], axis=1
        )  # (n_src, 4): median over frames
        self.track_scores.append(per_src)
        return framewise

    def aggregate(self):
        """{source: {metric: median-over-tracks}} plus flat {source: SDR}."""
        scores = np.stack(self.track_scores)  # (n_tracks, n_src, 4)
        med = np.nanmedian(scores, axis=0)  # (n_src, 4)
        table = {
            name: {m: float(v) for m, v in zip(self.METRICS, row)}
            for name, row in zip(self.sources, med)
        }
        # Backwards-compatible flat SDR view.
        for name in self.sources:
            table[name]["value"] = table[name]["SDR"]
        return table


class AttractorTester(Tester):
    """Spectrogram-domain tester (DANet / ADANet / deep clustering).

    Capability parity: reference AttractorTester / TesterBase for the
    embedding family (`egs/wsj0-mix/common/src/driver.py:600-701`): STFT the
    mixture, run the clustering inference path (no oracle assignment),
    resynthesize each source with the mixture phase, then report the same
    per-utterance metric CSV as the time-domain Tester.

    `kind`: 'danet' (attractors from clustering inside the model), 'adanet'
    (anchored attractors), or 'embedding' (DeepEmbedding + external KMeans).
    """

    def __init__(self, model, params, dataset, pit_criterion, n_fft: int,
                 hop_length: Optional[int] = None, window_fn: str = "hann",
                 kind: str = "danet", n_sources: int = 2,
                 iter_clustering: int = 10, **kwargs):
        super().__init__(model, params, dataset, pit_criterion, **kwargs)
        hop_length = hop_length or n_fft // 4
        if window_fn == "hann":
            k = jnp.arange(n_fft)
            window = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * k / n_fft)
        else:
            window = jnp.ones((n_fft,), jnp.float32)

        from ..algorithm.clustering import KMeans
        from ..ops.stft import istft, stft

        def forward(params_, mixture):  # (1, 1, T)
            T = mixture.shape[-1]
            spec = stft(mixture, n_fft, hop_length, window=window)  # (1, 1, F, S)
            amp = jnp.abs(spec)
            phase = jnp.angle(spec)
            if kind == "danet":
                est_amp = model.apply(params_, amp, None, None, n_sources)
            elif kind == "adanet":
                est_amp = model.apply(params_, amp, None, n_sources)
            elif kind == "embedding":
                emb = model.apply(params_, amp)  # (B, F, S, D)
                B, F, S, D = emb.shape
                flat = emb.reshape(B, F * S, D)
                assign, _ = KMeans(n_sources, n_iterations=iter_clustering)(flat)
                mask = jax.nn.one_hot(assign, n_sources, dtype=amp.dtype)
                mask = jnp.transpose(mask.reshape(B, F, S, n_sources), (0, 3, 1, 2))
                est_amp = mask * amp
            else:
                raise ValueError(f"Unsupported kind: {kind}")
            est_spec = est_amp * jnp.exp(1j * phase)
            return istft(est_spec, n_fft, hop_length, window=window, length=T)

        self._forward = jax.jit(forward)
