"""MUSDB18 evaluation CLI: chunked full-track inference + Wiener + median SDR.

Capability parity: reference `egs/musdb18/umx/src/adhoc_driver.py:243-416`
(AdhocTester.estimate_all / evaluate_all): each track is chunked into fixed
segments, forwarded through the spectrogram model (one compiled program per
chunk shape), the per-chunk magnitudes are concatenated along frames, the
multichannel Wiener EM refines against the mixture spectrogram, iSTFT
resynthesizes per-stem WAVs, and the Evaluater aggregates museval-style
median-of-medians SDR.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithm.frequency_mask import multichannel_wiener_filter
from ..data import musdb18 as musdb
from ..data.audio_io import write_wav
from ..models.base import load_model
from ..ops.stft import istft, stft
from ..ops.windows import build_window
from ..train.tester import Evaluater
from ..utils import enable_persistent_compilation_cache, set_seed


def build_parser():
    p = argparse.ArgumentParser("test_musdb18")
    p.add_argument("--musdb18_root", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--duration", type=float, default=10.0, help="chunk seconds")
    p.add_argument("--max_duration", type=float, default=None, help="cap per track")
    p.add_argument("--iter_wiener", type=int, default=1)
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--filt_len", type=int, default=512)
    p.add_argument("--win", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=111)
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    set_seed(args.seed)
    enable_persistent_compilation_cache()

    model, params, _ = load_model(args.model_path)
    n_fft, hop = model.n_fft, model.hop_length or model.n_fft // 4
    window = build_window(n_fft, model.window_fn)
    sources = list(model.base.sources)

    dataset = musdb.WaveTestDataset(args.musdb18_root, sources=sources)
    evaluater = Evaluater(sources=sources, sample_rate=args.sample_rate,
                          win=args.win, hop=args.win, filt_len=args.filt_len)

    chunk = int(args.duration * args.sample_rate)
    forward = jax.jit(model.apply)
    # Complex values must stay INSIDE compiled programs on the experimental
    # TPU backend: eager complex dispatch AND complex device<->host transfer
    # are UNIMPLEMENTED. Every jitted stage below therefore takes/returns
    # real-imag stacked float arrays at the host boundary and reconstructs
    # complex internally. Chunked stft/istft compile once (fixed shapes);
    # the full-track Wiener recompiles per track length, which a handful of
    # test tracks amortizes.
    @jax.jit
    def stft_ri(x):
        spec = stft(x, n_fft=n_fft, hop_length=hop, window=window)
        return jnp.stack([spec.real, spec.imag])

    @jax.jit
    def istft_from_ri(spec_ri):
        spec = spec_ri[0] + 1j * spec_ri[1]
        return istft(spec, n_fft=n_fft, hop_length=hop, window=window,
                     length=chunk)

    @jax.jit
    def wiener_ri(mix_ri, est_amp):
        mix_spec = mix_ri[0] + 1j * mix_ri[1]
        est = multichannel_wiener_filter(mix_spec, est_amp,
                                         iteration=args.iter_wiener)
        return jnp.stack([est.real, est.imag])

    def separate_track(mixture, T):
        n_chunks = -(-T // chunk)
        pad = n_chunks * chunk - T
        mix_p = np.pad(mixture, ((0, 0), (0, 0), (0, pad)))

        amps = []
        for i in range(n_chunks):
            seg = jnp.asarray(mix_p[None, :, :, i * chunk : (i + 1) * chunk])
            amps.append(np.asarray(forward(params, seg)[0]))  # (n_src, C, F, S)
        est_amp = np.concatenate(amps, axis=-1)

        mix_ri = np.concatenate(
            [
                np.asarray(stft_ri(jnp.asarray(mix_p[0, :, i * chunk : (i + 1) * chunk])))
                for i in range(n_chunks)
            ],
            axis=-1,
        )  # (2, C, F, S_total)

        est_ri = np.asarray(wiener_ri(
            jnp.asarray(mix_ri), jnp.asarray(est_amp),
        ))  # (2, n_src, C, F, S_total)

        # iSTFT per chunk span, then trim the zero pad.
        S_chunk = amps[0].shape[-1]
        waves = []
        for i in range(n_chunks):
            seg_ri = est_ri[..., i * S_chunk : (i + 1) * S_chunk]
            waves.append(np.asarray(istft_from_ri(jnp.asarray(seg_ri))))
        return np.concatenate(waves, axis=-1)[..., :T]  # (n_src, C, T)

    for name, mixture, refs in dataset:
        # mixture (1, C, T); refs (n_src, C, T)
        T = mixture.shape[-1]
        if args.max_duration is not None:
            T = min(T, int(args.max_duration * args.sample_rate))
            mixture, refs = mixture[..., :T], refs[..., :T]

        est_wave = separate_track(mixture, T)
        if not np.isfinite(est_wave).all():
            # Device->host transfers through the TPU tunnel have produced
            # transient garbage before (ROADMAP measurement notes); the same
            # track recomputes cleanly. Retry once, then sanitize so one bad
            # fetch cannot abort a multi-track evaluation.
            print(f"{name}: non-finite estimates "
                  f"({int((~np.isfinite(est_wave)).sum())} samples); retrying",
                  flush=True)
            est_wave = separate_track(mixture, T)
            if not np.isfinite(est_wave).all():
                print(f"{name}: non-finite after retry; zero-filling",
                      flush=True)
                est_wave = np.nan_to_num(est_wave, nan=0.0, posinf=0.0,
                                         neginf=0.0)

        evaluater.add_track(refs.transpose(0, 2, 1), est_wave.transpose(0, 2, 1))
        if args.out_dir:
            d = os.path.join(args.out_dir, name)
            os.makedirs(d, exist_ok=True)
            for s, src_name in enumerate(sources):
                write_wav(os.path.join(d, f"{src_name}.wav"), est_wave[s].T, args.sample_rate)
        print(f"{name}: done ({T / args.sample_rate:.1f}s)", flush=True)

    table = evaluater.aggregate()
    for metric in Evaluater.METRICS:
        print(
            f"{metric} (median of medians):",
            ", ".join(f"{k}: {v[metric]:.2f}" for k, v in table.items()),
            flush=True,
        )
    return table


if __name__ == "__main__":
    main()
