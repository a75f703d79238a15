"""Held-out musdb18-protocol quality evaluation (QUALITY.md, spectrogram arm).

Closes the second half of round-3 verdict item 1: train UMX at the paper
config on-chip via the REAL recipe shells (egs/musdb18/umx/train.sh) on a
synthetic musdb18-layout corpus with DISJOINT splits
(data/synthetic.py:write_musdb_quality_corpus — test songs use different
generator seeds AND non-overlapping source-parameter ranges), then run
test.sh -> cli/test_musdb18.py on the held-out songs: chunked full-track
inference + multichannel Wiener EM + museval-v4 median-of-medians SDR per
stem. Reported alongside the mixture-as-estimate floor and the oracle-IRM
upper bound computed on the SAME test split through the SAME Evaluater.

Reference protocol being matched:
  egs/musdb18/common/src/driver.py:301-330 (museval EvalStore aggregation)
  and the README tables it feeds (egs/musdb18/README.md:7-13).

Usage:
    python scripts/quality_eval_musdb.py --prepare     # corpus only
    python scripts/quality_eval_musdb.py --train       # recipe training
    python scripts/quality_eval_musdb.py --evaluate    # held-out eval + bounds
    python scripts/quality_eval_musdb.py               # all three
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)
# children (recipe CLIs) inherit this and share the persistent compile cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

CORPUS = "/tmp/dnntpu_musdb_quality"
EXP = "/tmp/dnntpu_musdb_quality_exp"
SOURCES = ("bass", "drums", "other", "vocals")
SR = 44100


def prepare(args):
    from dnn_based_source_separation_tpu.data.synthetic import (
        write_musdb_quality_corpus,
    )

    write_musdb_quality_corpus(args.corpus, n_train=args.n_train,
                               n_valid=args.n_valid, n_test=args.n_test,
                               track_sec=args.track_sec)


def train(args):
    env = dict(os.environ, musdb18_root=args.corpus, exp_dir=args.exp_dir)
    sh = os.path.join(ROOT, "egs", "musdb18", args.recipe, "train.sh")
    cmd = ["bash", sh,
           "--batch_size", str(args.batch_size),
           "--samples_per_epoch", str(args.samples_per_epoch),
           "--duration", "6.0",
           "--augmentation", "1",
           "--cache_in_memory", "1",
           "--num_workers", "2",
           "--epochs", "10000",
           "--overwrite", "1" if not args.continue_from else "0",
           "--time_budget_sec", str(args.time_budget_min * 60)]
    if args.continue_from:
        cmd += ["--continue_from", args.continue_from]
    print("train cmd:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd, env=env, cwd=os.path.dirname(sh))
    assert rc == 0, f"training failed rc={rc}"


def _parse_museval_table(text: str):
    """{metric: {source: value}} from test_musdb18's stdout lines."""
    table = {}
    for metric in ("SDR", "ISR", "SIR", "SAR"):
        m = re.search(rf"{metric} \(median of medians\): (.+)", text)
        assert m, f"no {metric} line in output:\n{text[-2000:]}"
        row = {}
        for part in m.group(1).split(", "):
            k, v = part.split(": ")
            row[k.strip()] = float(v)
        table[metric] = row
    return table


def _bound_tables(corpus: str, n_fft: int = 4096, hop: int = 1024):
    """Mixture-as-estimate floor and oracle-IRM upper bound on the test
    split, through the same museval-v4 Evaluater as the model run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dnn_based_source_separation_tpu.data import musdb18 as musdb
    from dnn_based_source_separation_tpu.ops.stft import istft, stft
    from dnn_based_source_separation_tpu.ops.windows import build_window
    from dnn_based_source_separation_tpu.train.tester import Evaluater

    window = build_window(n_fft, "hann")

    @jax.jit
    def irm_estimates(mix, refs):
        # mix (C, T); refs (n_src, C, T) -> (n_src, C, T) masked resynthesis
        T = mix.shape[-1]
        mix_spec = stft(mix, n_fft=n_fft, hop_length=hop, window=window)
        ref_spec = stft(refs.reshape(-1, T), n_fft=n_fft, hop_length=hop,
                        window=window).reshape(refs.shape[:2] + mix_spec.shape[-2:])
        mags = jnp.abs(ref_spec)
        masks = mags / jnp.maximum(mags.sum(axis=0, keepdims=True), 1e-12)
        est = (masks * mix_spec[None]).reshape((-1,) + mix_spec.shape[-2:])
        return istft(est, n_fft=n_fft, hop_length=hop, window=window,
                     length=T).reshape(refs.shape)

    ev_floor = Evaluater(sources=SOURCES, sample_rate=SR)
    ev_irm = Evaluater(sources=SOURCES, sample_rate=SR)
    for name, mixture, refs in musdb.WaveTestDataset(corpus, sources=SOURCES):
        mix = mixture[0]  # (C, T)
        n_src = refs.shape[0]
        refs_img = refs.transpose(0, 2, 1)  # (n_src, T, C)
        floor_est = np.tile(mix[None], (n_src, 1, 1)).transpose(0, 2, 1)
        ev_floor.add_track(refs_img, floor_est)
        irm = np.asarray(irm_estimates(jnp.asarray(mix), jnp.asarray(refs)))
        ev_irm.add_track(refs_img, irm.transpose(0, 2, 1))
        print(f"bounds {name}: done", flush=True)
    return ev_floor.aggregate(), ev_irm.aggregate()


def evaluate(args):
    env = dict(os.environ, musdb18_root=args.corpus, exp_dir=args.exp_dir,
               model_choice="best")
    sh = os.path.join(ROOT, "egs", "musdb18", args.recipe, "test.sh")
    print("test cmd:", "bash", sh, flush=True)
    out = subprocess.run(["bash", sh], env=env, cwd=os.path.dirname(sh),
                         capture_output=True, text=True)
    sys.stdout.write(out.stdout[-4000:])
    assert out.returncode == 0, f"test.sh failed:\n{out.stderr[-3000:]}"
    model = _parse_museval_table(out.stdout)

    floor, irm = _bound_tables(args.corpus)

    def sdr_row(table):
        return {s: table[s]["SDR"] for s in SOURCES}

    report = {
        "model_museval": model,
        "floor_sdr": sdr_row(floor),
        "oracle_irm_sdr": sdr_row(irm),
    }
    out_path = os.path.join(args.exp_dir, "quality_report_musdb.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("QUALITY_REPORT_MUSDB " + json.dumps(report), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--evaluate", action="store_true")
    ap.add_argument("--corpus", type=str, default=CORPUS)
    ap.add_argument("--recipe", type=str, default="umx",
                    help="recipe dir under egs/musdb18 with the standard "
                         "train.sh/test.sh env-var interface (umx, x-umx)")
    ap.add_argument("--exp_dir", type=str, default=EXP)
    ap.add_argument("--n_train", type=int, default=12)
    ap.add_argument("--n_valid", type=int, default=3)
    ap.add_argument("--n_test", type=int, default=6)
    ap.add_argument("--track_sec", type=float, default=40.0)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--samples_per_epoch", type=int, default=256)
    ap.add_argument("--time_budget_min", type=float, default=45.0)
    ap.add_argument("--continue_from", type=str, default=None)
    args = ap.parse_args()
    do_all = not (args.prepare or args.train or args.evaluate)
    if args.prepare or do_all:
        prepare(args)
    if args.train or do_all:
        train(args)
    if args.evaluate or do_all:
        evaluate(args)


if __name__ == "__main__":
    main()
