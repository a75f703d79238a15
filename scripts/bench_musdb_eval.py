"""On-chip musdb18 end-to-end serving-pipeline benchmark (verdict #5).

One jitted pipeline per chunk — STFT -> |.| -> ParallelOpenUnmix (paper cfg)
-> concat frames -> multichannel Wiener EM (complex einsum path) -> iSTFT ->
4 stems — over a full synthetic stereo track, timed on the real TPU.
Mirrors the reference musdb18 evaluation flow
(`/root/reference/egs/musdb18/umx/src/adhoc_driver.py:296-372`).

Also cross-checks the complex Wiener-EM path numerically between the TPU
and the CPU backend (same inputs, |Δ| bound) — the eager complex-ops gap on
the experimental TPU backend makes this the one numerical path that never
runs under the CPU-mesh test suite.

Usage: python scripts/bench_musdb_eval.py [--seconds 60] [--iter_wiener 1]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chunk", type=float, default=10.0)
    ap.add_argument("--iter_wiener", type=int, default=1)
    ap.add_argument("--sample_rate", type=int, default=44100)
    args = ap.parse_args()

    from dnn_based_source_separation_tpu.algorithm.frequency_mask import (
        multichannel_wiener_filter,
    )
    from dnn_based_source_separation_tpu.models import ParallelOpenUnmix
    from dnn_based_source_separation_tpu.ops.stft import istft, stft
    from dnn_based_source_separation_tpu.ops.windows import build_window

    sr = args.sample_rate
    n_fft, hop = 4096, 1024
    window = build_window(n_fft, "hann")
    chunk = int(args.chunk * sr)
    T = int(args.seconds * sr)
    n_chunks = -(-T // chunk)

    model = ParallelOpenUnmix(in_channels=2, hidden_channels=512, num_layers=3,
                              n_bins=n_fft // 2 + 1, max_bin=1487, dropout=0.0)
    rng = np.random.default_rng(0)
    track = rng.standard_normal((2, n_chunks * chunk)).astype(np.float32) * 0.1
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, 2, n_fft // 2 + 1, 16), jnp.float32))

    stft_jit = jax.jit(functools.partial(stft, n_fft=n_fft, hop_length=hop, window=window))
    istft_jit = jax.jit(functools.partial(istft, n_fft=n_fft, hop_length=hop,
                                          window=window, length=chunk))
    wiener_jit = jax.jit(functools.partial(
        multichannel_wiener_filter, iteration=args.iter_wiener))

    def chunk_amp(params, seg_wave):  # (1, 2, chunk) -> (1, n_src, 2, F, S)
        spec = stft(seg_wave, n_fft, hop, window=window)
        return model.apply(params, jnp.abs(spec)[:, None])

    chunk_amp_jit = jax.jit(chunk_amp)

    # One scalar over a list of arrays: float()-fetching it forces every
    # element to materialize. block_until_ready() is NOT a reliable barrier
    # on this remote backend (it can return before the work runs), so every
    # timed region below ends in a scalar value fetch instead.
    checksum_jit = jax.jit(
        lambda ws: sum(jnp.sum(w.astype(jnp.float32)) for w in ws))

    def run_track():
        amps, specs = [], []
        for i in range(n_chunks):
            seg = jnp.asarray(track[None, :, i * chunk : (i + 1) * chunk])
            amps.append(chunk_amp_jit(variables, seg))
            specs.append(stft_jit(jnp.asarray(track[:, i * chunk : (i + 1) * chunk])))
        waves = []
        for i in range(n_chunks):
            est = wiener_jit(specs[i], amps[i][0])  # (n_src, 2, F, S) complex
            waves.append(istft_jit(est))
        float(checksum_jit(waves))
        return waves

    run_track()  # compile
    ts = []
    for _ in range(3):
        s = time.perf_counter()
        run_track()
        ts.append(time.perf_counter() - s)
    wall = float(np.median(ts))
    rtf = (n_chunks * chunk / sr) / wall
    print(f"musdb18 eval pipeline (UMX paper cfg, {args.seconds:.0f}s stereo track, "
          f"Wiener iter={args.iter_wiener}): {wall:.2f} s wall -> track-RTF {rtf:.0f}x",
          flush=True)

    # Stage split: model+stft vs wiener+istft.
    s = time.perf_counter()
    amps = [chunk_amp_jit(variables, jnp.asarray(track[None, :, i * chunk:(i + 1) * chunk]))
            for i in range(n_chunks)]
    float(checksum_jit(amps))
    t_model = time.perf_counter() - s
    print(f"  stage split: model+stft {t_model:.2f} s, wiener+istft "
          f"{wall - t_model:.2f} s", flush=True)

    # CPU-vs-TPU numerical match of the complex EM path. The experimental
    # TPU backend cannot device_put complex64 host arrays, so the complex
    # spectrogram is formed from real/imag parts INSIDE jit on both sides.
    spec_re = rng.standard_normal((2, 65, 40)).astype(np.float32)
    spec_im = rng.standard_normal((2, 65, 40)).astype(np.float32)
    amp_small = np.abs(rng.standard_normal((4, 2, 65, 40))).astype(np.float32)

    def wiener_from_parts(re, im, amp):
        est = multichannel_wiener_filter(jax.lax.complex(re, im), amp,
                                         iteration=args.iter_wiener)
        return jnp.stack([est.real, est.imag])

    on_tpu = np.asarray(jax.jit(wiener_from_parts)(
        jnp.asarray(spec_re), jnp.asarray(spec_im), jnp.asarray(amp_small)))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        on_cpu = np.asarray(jax.jit(wiener_from_parts)(
            jnp.asarray(spec_re), jnp.asarray(spec_im), jnp.asarray(amp_small)))
    err = float(np.max(np.abs(on_tpu - on_cpu)) / (np.max(np.abs(on_cpu)) + 1e-12))
    status = "PASS" if err < 1e-3 else "FAIL"
    print(f"  complex Wiener-EM TPU-vs-CPU rel max err: {err:.2e} [{status}]", flush=True)
    return rtf


if __name__ == "__main__":
    main()
