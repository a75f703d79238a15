"""Oracle ideal-mask evaluation (model-free sanity harness).

Capability parity: reference `egs/wsj0-mix/frequency-mask/local/test.py:17`:
evaluates IBM/IRM/WFM/PSM upper bounds on a test set, validating the data +
metric plumbing independent of any model (SURVEY.md §4.3).
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ..algorithm.frequency_mask import (
    compute_ideal_binary_mask,
    compute_ideal_ratio_mask,
    compute_phase_sensitive_mask,
    compute_wiener_filter_mask,
)
from ..criterion.sdr import sisdr
from ..data import WaveTestDataset
from ..ops.stft import istft, stft
from ..ops.windows import build_window

MASKS = {
    "ibm": compute_ideal_binary_mask,
    "irm": compute_ideal_ratio_mask,
    "wfm": compute_wiener_filter_mask,
    "psm": compute_phase_sensitive_mask,
}


def build_parser():
    p = argparse.ArgumentParser("test_oracle_masks")
    p.add_argument("--test_wav_root", type=str, required=True)
    p.add_argument("--test_list_path", type=str, required=True)
    p.add_argument("--n_sources", type=int, default=2)
    p.add_argument("--n_fft", type=int, default=256)
    p.add_argument("--hop_length", type=int, default=64)
    p.add_argument("--mask", type=str, default="ibm", choices=sorted(MASKS))
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    window = build_window(args.n_fft, "hann")
    make_mask = MASKS[args.mask]

    import jax

    # One compiled program per utterance length: complex elementwise ops are
    # only implemented inside compiled programs on the experimental TPU
    # backend, and jit also fuses the whole mask->resynth->metric pipeline.
    @jax.jit
    def oracle_separate(mixture, sources):
        T = mixture.shape[-1]
        mix_spec = stft(mixture[0], args.n_fft, args.hop_length, window=window)
        src_spec = stft(sources, args.n_fft, args.hop_length, window=window)
        mask = make_mask(src_spec)
        est_spec = mask * mix_spec[None]
        est = istft(est_spec, args.n_fft, args.hop_length, window=window, length=T)
        si_est = jnp.mean(sisdr(est, sources))
        si_mix = jnp.mean(sisdr(jnp.tile(mixture, (sources.shape[0], 1)), sources))
        return si_est, si_mix

    improvements = []
    for utt_id, mixture, sources in WaveTestDataset(
        args.test_wav_root, args.test_list_path, n_sources=args.n_sources
    ):
        si_est, si_mix = oracle_separate(jnp.asarray(mixture), jnp.asarray(sources))
        si_est, si_mix = float(si_est), float(si_mix)
        improvements.append(si_est - si_mix)
        print(f"{utt_id}, SI-SDRi: {improvements[-1]:.3f}", flush=True)

    mean_imp = float(np.mean(improvements))
    print(f"Oracle {args.mask.upper()} SI-SDRi: {mean_imp:.3f} dB", flush=True)
    return mean_imp


if __name__ == "__main__":
    main()
