"""Training-step throughput benchmark (single chip or mesh) + sustained soak.

Default mode measures audio-seconds/sec through the FULL compiled training
step (forward + loss + backward + clip + Adam) at recipe-scale configs, two
ways per row:
  * dispatch: per-step host dispatch (includes the remote tunnel's ~25-30 ms
    fixed per-call latency in this environment);
  * on-device: a lax.scan chain of steps in ONE dispatch — the pure compute
    floor, what a locally-attached chip sustains.
MFU is XLA-cost-model FLOPs of the compiled step over chip peak at the
on-device step time.

--sustained MINUTES runs the REAL pipeline end to end (round-2 verdict #2):
a >=1 h synthetic wsj0-style corpus on disk, the actual Trainer + native WAV
loader + prefetch_to_device at the Conv-TasNet paper config, a mid-run
SIGKILL + --continue_from resume, and reports sustained audio-sec/s,
loader-stall fraction and step-time p50/p99 (printed by the Trainer's
instrumented epoch loop). Usage:
    python scripts/bench_train.py
    python scripts/bench_train.py --sustained 20
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

PEAK_FLOPS = {
    "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5": 459e12,
    "TPU v5p": 459e12, "TPU v6 lite": 918e12,
}


def bench_train(model, criterion, mixture, sources, audio_sec, steps=8,
                compute_dtype=None, train_kwargs=None, scan_steps=16):
    """Returns (rtf_dispatch, rtf_ondevice, mfu)."""
    from dnn_based_source_separation_tpu.train.steps import (
        make_optimizer, make_train_step,
    )

    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    print("  [bench] init...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), mixture)
    opt_state = optimizer.init(variables["params"])
    step = make_train_step(model, criterion, optimizer,
                           compute_dtype=compute_dtype, train_kwargs=train_kwargs)

    # FLOPs of one full step (XLA cost model), before donation consumes buffers.
    inner = make_train_step(model, criterion, optimizer,
                            compute_dtype=compute_dtype, train_kwargs=train_kwargs,
                            donate=False)
    print("  [bench] cost-model compile...", flush=True)
    try:
        c = inner.lower(variables, opt_state, mixture, sources).compile()
        step_flops = float(c.cost_analysis()["flops"])
    except Exception:
        step_flops = float("nan")

    # On-device chain: scan N steps in one dispatch (no per-step tunnel cost).

    def chain(variables, opt_state, mixture, sources):
        def body(carry, _):
            v, o = carry
            v, o, loss = inner(v, o, mixture, sources)
            return (v, o), loss

        (v, o), losses = jax.lax.scan(body, (variables, opt_state), None,
                                      length=scan_steps)
        return losses[-1]

    chain_jit = jax.jit(chain)
    print("  [bench] chain compile+warmup...", flush=True)
    float(chain_jit(variables, opt_state, mixture, sources))  # compile
    print("  [bench] chain timing...", flush=True)
    ts = []
    for _ in range(3):
        s = time.perf_counter()
        float(chain_jit(variables, opt_state, mixture, sources))
        ts.append((time.perf_counter() - s) / scan_steps)
    sec_device = float(np.median(ts))

    # Host-dispatch loop (donating step).
    print("  [bench] dispatch timing...", flush=True)
    variables, opt_state, loss = step(variables, opt_state, mixture, sources)
    float(loss)
    ts = []
    for _ in range(3):
        s = time.perf_counter()
        for _ in range(steps):
            variables, opt_state, loss = step(variables, opt_state, mixture, sources)
        float(loss)
        ts.append((time.perf_counter() - s) / steps)
    sec_dispatch = float(np.median(ts))

    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
    mfu = step_flops / sec_device / peak
    return audio_sec / sec_dispatch, audio_sec / sec_device, mfu


def standard_table():
    from dnn_based_source_separation_tpu.criterion import MSELoss, NegSISDR, PIT1d
    from dnn_based_source_separation_tpu.criterion.spectral import SpectralTargetAdapter
    from dnn_based_source_separation_tpu.models import (
        ConvTasNet, DPRNNTasNet, ParallelOpenUnmix,
    )
    from dnn_based_source_separation_tpu.models.wrappers import SpectrogramMaskingWrapper

    crit = PIT1d(NegSISDR(), n_sources=2)
    rng = np.random.default_rng(0)
    rows = []

    conv = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=False, n_sources=2,
    )
    B, T = 4, 32000
    mix = jnp.asarray(rng.standard_normal((B, 1, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        rows.append((f"Conv-TasNet (paper, batch 4, {name})",
                     *bench_train(conv, crit, mix, src, B * T / 8000, compute_dtype=dt)))

    dprnn = DPRNNTasNet(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        causal=False, n_sources=2,
    )
    B = 2
    mix = jnp.asarray(rng.standard_normal((B, 1, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)
    rows.append(("DPRNN-TasNet (recipe, batch 2, bf16)",
                 *bench_train(dprnn, crit, mix, src, B * T / 8000, steps=4,
                              compute_dtype=jnp.bfloat16, scan_steps=8)))

    # Spectrogram-domain training row: UMX paper config through the real CLI
    # path (SpectrogramMaskingWrapper + spectral-MSE on waveform targets),
    # 16 x 6 s stereo batches @ 44.1 kHz (reference egs/musdb18/umx).
    umx = SpectrogramMaskingWrapper(
        ParallelOpenUnmix(in_channels=2, hidden_channels=512, num_layers=3,
                          n_bins=2049, max_bin=1487, dropout=0.0),
        4096, 1024, "hann")
    spec_mse = SpectralTargetAdapter(MSELoss(dim=(-2, -1)), 4096, 1024, "hann")
    B, T, sr = 16, 6 * 44100, 44100
    mix = jnp.asarray(rng.standard_normal((B, 1, 2, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 4, 2, T)), jnp.float32)
    rows.append(("UMX x4 stems (paper cfg, batch 16, bf16)",
                 *bench_train(umx, spec_mse, mix, src, B * T / sr, steps=4,
                              compute_dtype=jnp.bfloat16,
                              train_kwargs={"train": True}, scan_steps=8)))

    print("| Config | dispatch audio-sec/s | on-device audio-sec/s | step MFU |")
    print("|---|---|---|---|")
    for name, rtf_d, rtf_o, mfu in rows:
        print(f"| {name} | {rtf_d:.0f} | {rtf_o:.0f} | {mfu:.1%} |", flush=True)
    return rows


# ---------------------------------------------------------------------------
# Sustained soak
# ---------------------------------------------------------------------------

def ensure_corpus(root: str, hours: float = 1.0, sr: int = 8000,
                  utt_sec: float = 6.0, seed: int = 0):
    """Synthetic wsj0-2mix-layout corpus on disk (mix/s1/s2 PCM16 WAVs)."""
    from dnn_based_source_separation_tpu.data.audio_io import write_wav

    list_path = os.path.join(root, "tr.lst")
    if os.path.exists(list_path):
        return root, list_path
    rng = np.random.default_rng(seed)
    for sub in ("mix", "s1", "s2"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    n_utts = int(hours * 3600 / utt_sec)
    T = int(utt_sec * sr)
    utts = []
    t = np.arange(T) / sr
    for i in range(n_utts):
        # Band-limited chirps + noise: cheap, nontrivial, bounded.
        f1, f2 = rng.uniform(80, 1200, 2)
        s1 = 0.3 * np.sin(2 * np.pi * f1 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.3 * t)))
        s2 = 0.3 * np.sin(2 * np.pi * f2 * t * (1 + 0.1 * np.cos(2 * np.pi * 0.2 * t)))
        s1 = (s1 + 0.02 * rng.standard_normal(T)).astype(np.float32)
        s2 = (s2 + 0.02 * rng.standard_normal(T)).astype(np.float32)
        utt = f"soak{i:05d}"
        write_wav(os.path.join(root, "s1", utt + ".wav"), s1, sr)
        write_wav(os.path.join(root, "s2", utt + ".wav"), s2, sr)
        write_wav(os.path.join(root, "mix", utt + ".wav"), s1 + s2, sr)
        utts.append(utt)
    with open(list_path, "w") as f:
        f.write("\n".join(utts))
    print(f"corpus: wrote {n_utts} x {utt_sec:.0f}s utterances "
          f"({n_utts * utt_sec / 3600:.2f} h) under {root}", flush=True)
    return root, list_path


def soak_worker(args):
    """Run the REAL Trainer at Conv-TasNet paper config on the on-disk corpus."""
    from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
    from dnn_based_source_separation_tpu.data import DataLoader, wsj0mix
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.train.steps import make_optimizer
    from dnn_based_source_separation_tpu.train.trainer import Trainer, TrainerConfig

    root, list_path = ensure_corpus(args.corpus)
    train_ds = wsj0mix.WaveTrainDataset(root, list_path, samples=32000,
                                        cache_in_memory=bool(args.cache))
    # Tiny validation split so eval does not distort the soak timing.
    valid_list = os.path.join(root, "cv.lst")
    if not os.path.exists(valid_list):
        with open(list_path) as f:
            utts = f.read().split()
        with open(valid_list, "w") as f:
            f.write("\n".join(utts[:4]))
    valid_ds = wsj0mix.WaveEvalDataset(root, valid_list, max_samples=32000)

    train_loader = DataLoader(train_ds, batch_size=args.batch_size, shuffle=True,
                              seed=0, num_workers=args.num_workers, prefetch=4)
    valid_loader = DataLoader(valid_ds, batch_size=1)
    print(f"soak: {len(train_ds)} train windows "
          f"({len(train_ds) * 4 / 3600:.2f} h/epoch)", flush=True)

    model = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=False, n_sources=2,
    )
    criterion = PIT1d(NegSISDR(), n_sources=2)
    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    config = TrainerConfig(
        epochs=10000, exp_dir=args.exp_dir, sample_rate=8000,
        continue_from=args.continue_from or None,
        overwrite=True, save_valid_wavs=0, log_interval=200,
        time_budget_sec=args.minutes * 60.0,
    )
    trainer = Trainer(model, train_loader, valid_loader, criterion, optimizer,
                      config, compute_dtype=jnp.bfloat16)
    trainer.run()
    if trainer.last_epoch_stats:
        import json

        print("SOAK_STATS " + json.dumps(trainer.last_epoch_stats), flush=True)


def ensure_musdb_corpus(root: str, n_tracks: int = 10, track_sec: float = 45.0,
                        sr: int = 44100, seed: int = 7):
    """Synthetic musdb18-layout corpus: stereo 44.1 kHz 4-stem tracks.

    Stems are spectrally distinct (bass: low glides; drums: noise bursts;
    other: chord pads; vocals: vibrato formant tones) so magnitude-mask
    training has real structure to learn; mixture.wav = sum of stems,
    matching the musdb18 file layout (`data/musdb18.py:_MUSDB18Base`).
    """
    from dnn_based_source_separation_tpu.data.audio_io import write_wav

    train_txt = os.path.join(root, "train.txt")
    if os.path.exists(train_txt):
        return root
    rng = np.random.default_rng(seed)
    T = int(track_sec * sr)
    t = np.arange(T) / sr
    names = []
    for i in range(n_tracks):
        name = f"strack{i:03d}"
        d = os.path.join(root, "train", name)
        os.makedirs(d, exist_ok=True)
        stems = {}
        # bass: slow square-ish glide 60-150 Hz
        f0 = rng.uniform(60, 150)
        ph = 2 * np.pi * f0 * t * (1 + 0.05 * np.sin(2 * np.pi * 0.05 * t))
        stems["bass"] = 0.25 * np.tanh(3 * np.sin(ph))
        # drums: periodic decaying noise bursts at 1.5-3 Hz
        rate = rng.uniform(1.5, 3.0)
        env = np.exp(-12.0 * ((t * rate) % 1.0))
        stems["drums"] = 0.3 * env * rng.standard_normal(T)
        # other: 3-note chord pad, mid register
        base = rng.uniform(200, 400)
        pad = sum(np.sin(2 * np.pi * base * r * t) for r in (1.0, 1.25, 1.5))
        stems["other"] = 0.12 * pad * (0.6 + 0.4 * np.sin(2 * np.pi * 0.1 * t))
        # vocals: vibrato tone + 2 formant partials, syllable-gated
        fv = rng.uniform(150, 320)
        vib = fv * (1 + 0.02 * np.sin(2 * np.pi * 5.5 * t))
        gate = (np.sin(2 * np.pi * rng.uniform(0.8, 1.6) * t) > -0.3).astype(np.float64)
        stems["vocals"] = 0.2 * gate * (
            np.sin(2 * np.pi * np.cumsum(vib) / sr)
            + 0.5 * np.sin(2 * np.pi * 2.2 * np.cumsum(vib) / sr))
        mix = None
        for s, x in stems.items():
            pan = rng.uniform(0.35, 0.65)
            st = np.stack([x * pan, x * (1 - pan)], axis=1).astype(np.float32)
            write_wav(os.path.join(d, f"{s}.wav"), st, sr)
            mix = st if mix is None else mix + st
        write_wav(os.path.join(d, "mixture.wav"), mix, sr)
        names.append(name)
    with open(train_txt, "w") as f:
        f.write("\n".join(names))
    with open(os.path.join(root, "validation.txt"), "w") as f:
        f.write("\n".join(names[-2:]))
    print(f"musdb corpus: wrote {n_tracks} x {track_sec:.0f}s stereo tracks "
          f"under {root}", flush=True)
    return root


def musdb_soak_orchestrate(args):
    """Spectrogram-pipeline soak (round-3 verdict item 9): the real musdb18
    recipe path — 44.1 kHz stereo on-disk tracks, random-remix augmentation,
    STFT inside the jitted step (UMX paper config) — with a mid-run SIGKILL
    and --continue_from resume, driven through the REAL CLI
    (`cli/train_musdb18.py`), not a bespoke worker."""
    # Keep the musdb artifacts apart from the wsj0-layout soak's defaults.
    corpus = (args.corpus if args.corpus != "/tmp/dnntpu_soak_corpus"
              else "/tmp/dnntpu_musdb_corpus")
    exp_dir = (args.exp_dir if args.exp_dir != "/tmp/dnntpu_soak_exp"
               else "/tmp/dnntpu_musdb_exp")
    batch_size = args.batch_size if args.batch_size != 4 else 16  # UMX recipe
    os.makedirs(exp_dir, exist_ok=True)
    ensure_musdb_corpus(corpus)
    phase_a_min = max(args.sustained_musdb * 0.4, 1.0)
    phase_b_min = max(args.sustained_musdb - phase_a_min, 1.0)

    base = [sys.executable, "-m",
            "dnn_based_source_separation_tpu.cli.train_musdb18",
            "--musdb18_root", corpus, "--exp_dir", exp_dir,
            "--model", "umx", "--augmentation", "1",
            "--samples_per_epoch", "256", "--duration", "6.0",
            "--batch_size", str(batch_size),
            "--num_workers", str(args.num_workers),
            "--cache_in_memory", str(args.cache),
            "--epochs", "10000", "--overwrite", "1"]
    # APPEND the repo root to PYTHONPATH: replacing it would drop entries
    # the environment needs for backend plugin discovery (e.g. the axon
    # TPU plugin living on the inherited PYTHONPATH).
    repo_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        p for p in (os.environ.get("PYTHONPATH", ""), repo_root) if p))
    log_a = os.path.join(exp_dir, "musdb_soak_phase_a.log")
    print(f"phase A: UMX musdb18 recipe ~{phase_a_min:.1f} min then SIGKILL "
          f"(log: {log_a})", flush=True)
    with open(log_a, "w") as f:
        proc = subprocess.Popen(
            base + ["--time_budget_sec", str(args.sustained_musdb * 60)],
            stdout=f, stderr=subprocess.STDOUT, env=env)
        time.sleep(phase_a_min * 60)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    print("phase A killed (simulated failure).", flush=True)

    ckpt = os.path.join(exp_dir, "model", "last.ckpt")
    assert os.path.exists(ckpt), "no checkpoint written before the kill"

    log_b = os.path.join(exp_dir, "musdb_soak_phase_b.log")
    print(f"phase B: resuming from {ckpt} for ~{phase_b_min:.1f} min "
          f"(log: {log_b})", flush=True)
    with open(log_b, "w") as f:
        rc = subprocess.call(
            base + ["--time_budget_sec", str(phase_b_min * 60),
                    "--continue_from", ckpt, "--overwrite", "0"],
            stdout=f, stderr=subprocess.STDOUT, env=env)
    assert rc == 0, f"resume phase failed (rc={rc}); see {log_b}"

    import re

    stats, stalls, resumed_epoch = [], [], None
    for log in (log_a, log_b):
        for line in open(log):
            m = re.search(r"training throughput: ([0-9.]+) audio-seconds/sec",
                          line)
            if m:
                stats.append(float(m.group(1)))
                ms = re.search(r"loader-stall ([0-9.]+)%", line)
                if ms:
                    stalls.append(float(ms.group(1)))
            m = re.match(r"\[Epoch (\d+)/", line)
            if m and log is log_b and resumed_epoch is None:
                resumed_epoch = int(m.group(1))
    print(f"\nmusdb18 sustained soak summary ({args.sustained_musdb:.0f} min "
          f"budget, kill at {phase_a_min:.1f} min, resume at epoch "
          f"{resumed_epoch}):")
    print(f"  epochs completed: {len(stats)}")
    print(f"  sustained audio-sec/s: median {np.median(stats):.1f} "
          f"(min {min(stats):.1f}, max {max(stats):.1f})")
    if stalls:
        print(f"  loader-stall fraction: median {np.median(stalls):.1f}% "
              f"(max {max(stalls):.1f}%)")
    return {"epochs": len(stats), "sustained_median": float(np.median(stats))}


def soak_orchestrate(args):
    """Phase A: train, SIGKILL mid-run. Phase B: resume to the time budget."""
    exp_dir = args.exp_dir
    os.makedirs(exp_dir, exist_ok=True)
    ensure_corpus(args.corpus)
    phase_a_min = max(args.sustained * 0.4, 1.0)
    phase_b_min = max(args.sustained - phase_a_min, 1.0)

    base = [sys.executable, os.path.abspath(__file__),
            "--soak_worker", "--corpus", args.corpus, "--exp_dir", exp_dir,
            "--num_workers", str(args.num_workers),
            "--batch_size", str(args.batch_size),
            "--cache", str(args.cache)]
    log_a = os.path.join(exp_dir, "soak_phase_a.log")
    print(f"phase A: training ~{phase_a_min:.1f} min then SIGKILL (log: {log_a})",
          flush=True)
    with open(log_a, "w") as f:
        proc = subprocess.Popen(base + ["--minutes", str(args.sustained)],
                                stdout=f, stderr=subprocess.STDOUT)
        time.sleep(phase_a_min * 60)
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    print("phase A killed (simulated failure).", flush=True)

    ckpt = os.path.join(exp_dir, "model", "last.ckpt")
    assert os.path.exists(ckpt), "no checkpoint written before the kill"

    log_b = os.path.join(exp_dir, "soak_phase_b.log")
    print(f"phase B: resuming from {ckpt} for ~{phase_b_min:.1f} min "
          f"(log: {log_b})", flush=True)
    with open(log_b, "w") as f:
        rc = subprocess.call(base + ["--minutes", str(phase_b_min),
                                     "--continue_from", ckpt],
                             stdout=f, stderr=subprocess.STDOUT)
    assert rc == 0, f"resume phase failed (rc={rc}); see {log_b}"

    # Summarize: pull throughput lines + final stats from both logs.
    import json
    import re

    stats, resumed_epoch, final = [], None, None
    for log in (log_a, log_b):
        for line in open(log):
            m = re.search(r"training throughput: ([0-9.]+) audio-seconds/sec", line)
            if m:
                stats.append(float(m.group(1)))
            if "SOAK_STATS" in line:
                final = json.loads(line.split("SOAK_STATS ", 1)[1])
            m = re.match(r"\[Epoch (\d+)/", line)
            if m and log is log_b and resumed_epoch is None:
                resumed_epoch = int(m.group(1))
    print(f"\nsustained soak summary ({args.sustained:.0f} min budget, "
          f"kill at {phase_a_min:.1f} min, resume at epoch {resumed_epoch}):")
    print(f"  epochs completed: {len(stats)}")
    print(f"  sustained audio-sec/s: median {np.median(stats):.1f} "
          f"(min {min(stats):.1f}, max {max(stats):.1f})")
    print(f"  final epoch stats: {final}")
    return {"epochs": len(stats), "sustained_median": float(np.median(stats)),
            "final": final}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sustained", type=float, default=0.0,
                    help="minutes: run the real-pipeline soak (kill + resume)")
    ap.add_argument("--sustained_musdb", type=float, default=0.0,
                    help="minutes: musdb18-path soak (44.1 kHz stereo, remix "
                         "augmentation, STFT-in-step UMX; kill + resume)")
    ap.add_argument("--soak_worker", action="store_true")
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--continue_from", type=str, default="")
    ap.add_argument("--corpus", type=str, default="/tmp/dnntpu_soak_corpus")
    ap.add_argument("--exp_dir", type=str, default="/tmp/dnntpu_soak_exp")
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--cache", type=int, default=0,
                    help="soak: cache decoded waveforms in RAM (dataset cache_in_memory)")
    args = ap.parse_args()

    if args.soak_worker:
        soak_worker(args)
    elif args.sustained > 0:
        soak_orchestrate(args)
    elif args.sustained_musdb > 0:
        musdb_soak_orchestrate(args)
    else:
        standard_table()


if __name__ == "__main__":
    main()
