"""In-domain validation of the in-tree PESQ tool (round-3 verdict item 8).

The Tester's PESQ column is only useful if the tool RANKS real separation
outputs consistently with SI-SDR. Two checks, both on the held-out tt
split of the quality corpus (scripts/quality_eval.py artifacts):

1. **Across tt utterances**: Spearman rank correlation between the
   per-utterance SI-SDRi and PESQ columns of the Tester CSV (parsed from
   the quality_eval log). These are REAL model outputs at a fixed
   checkpoint — exactly the population the Tester averages over.
2. **Across degradation levels** (checkpoint-quality proxy): for each of
   the first N tt utterances, build estimates `s1 + g * s2` sweeping the
   interferer gain g (monotone SI-SDR ladder spanning the quality range a
   training run traverses) and require PESQ to rank them perfectly
   (per-utterance Spearman == 1.0).

Prints one JSON line; pin the numbers in native/pesq/CALIBRATION.md.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import tempfile

import numpy as np

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)


def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def per_utterance_corr(log_path: str):
    """Spearman(SI-SDRi, PESQ) across the Tester's per-utterance CSV lines."""
    rows = []
    pat = re.compile(
        r"^(tt\d+), ([-\d.]+), ([-\d.]+), ([-\d.]+), ([-\d.]+), ([-\d.]+), "
        r"([-\d.]+)\s*$")
    for line in open(log_path):
        m = pat.match(line)
        if m:
            rows.append((float(m.group(3)), float(m.group(7))))  # si_sdri, pesq
    assert len(rows) >= 32, f"only {len(rows)} tester CSV rows in {log_path}"
    si, pesq = np.asarray(rows).T
    return spearman(si, pesq), len(rows)


def si_sdr(est, ref):
    alpha = (est * ref).sum() / (ref * ref).sum()
    t = alpha * ref
    return 10 * np.log10((t**2).sum() / ((est - t) ** 2).sum())


def degradation_corr(corpus: str, pesq_bin: str, n_utts: int = 8,
                     gains=(0.02, 0.05, 0.1, 0.2, 0.4, 0.8)):
    """Per-utterance Spearman(SI-SDR, PESQ) over an interferer-gain ladder."""
    from dnn_based_source_separation_tpu.data.audio_io import read_wav, write_wav
    from dnn_based_source_separation_tpu.utils.audio import evaluate_pesq

    tt = os.path.join(corpus, "tt")
    utts = sorted(open(os.path.join(corpus, "tt.lst")).read().split())[:n_utts]
    corrs = []
    with tempfile.TemporaryDirectory() as td:
        for utt in utts:
            s1, sr = read_wav(os.path.join(tt, "s1", utt + ".wav"))
            s2, _ = read_wav(os.path.join(tt, "s2", utt + ".wav"))
            s1, s2 = s1.astype(np.float64), s2.astype(np.float64)
            ref_path = os.path.join(td, "ref.wav")
            write_wav(ref_path, s1.astype(np.float32), sr)
            sis, pesqs = [], []
            for g in gains:
                est = s1 + g * s2
                est_path = os.path.join(td, "est.wav")
                write_wav(est_path, (est / max(1.0, np.abs(est).max())
                                     ).astype(np.float32), sr)
                sis.append(si_sdr(est, s1))
                pesqs.append(evaluate_pesq(pesq_bin, ref_path, est_path, sr))
            corrs.append(spearman(np.asarray(sis), np.asarray(pesqs)))
    return corrs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/quality_eval_r4.log",
                    help="quality_eval stdout with the Tester CSV lines")
    ap.add_argument("--corpus", default="/tmp/dnntpu_quality_corpus")
    ap.add_argument("--pesq_bin", default=os.path.join(ROOT, "native", "pesq", "pesq"))
    ap.add_argument("--n_utts", type=int, default=8)
    args = ap.parse_args()

    utt_corr, n = per_utterance_corr(args.log)
    deg = degradation_corr(args.corpus, args.pesq_bin, n_utts=args.n_utts)
    report = {
        "per_utterance_spearman_si_sdri_vs_pesq": round(utt_corr, 4),
        "n_utterances": n,
        "degradation_ladder_spearman_min": round(float(np.min(deg)), 4),
        "degradation_ladder_spearman_mean": round(float(np.mean(deg)), 4),
        "n_ladder_utts": len(deg),
    }
    print("PESQ_VALIDATION " + json.dumps(report))


if __name__ == "__main__":
    main()
