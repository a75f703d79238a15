"""Multi-model inference benchmark table (amortized on-device timing).

Measures audio-seconds/sec per chip for several zoo models at their
recipe-scale configurations. Usage: python scripts/bench_models.py
Writes/updates BENCHMARKS.md at the repo root.
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def amortized_ms(apply_fn, params, xs):
    many = jax.jit(
        lambda p, xs: jax.lax.scan(
            lambda c, x: (c + jnp.sum(apply_fn(p, x).astype(jnp.float32)), None),
            jnp.float32(0.0), xs,
        )[0]
    )
    float(many(params, xs))
    float(many(params, xs))
    ts = []
    for _ in range(4):
        s = time.perf_counter()
        float(many(params, xs))
        ts.append(time.perf_counter() - s)
    return float(np.median(ts)) / xs.shape[0] * 1e3


PEAK_FLOPS = {
    "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5": 459e12,
    "TPU v5p": 459e12, "TPU v6 lite": 918e12,
}


def model_mfu(apply_fn, params, x, ms):
    """Analytic-FLOPs (XLA cost model) over chip peak at the measured time."""
    try:
        c = jax.jit(apply_fn).lower(params, x).compile()
        flops = float(c.cost_analysis()["flops"])
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
        return flops / (ms / 1e3) / peak
    except Exception:
        return float("nan")


def bench_waveform_model(model, B, T, sr, dtype, iters=8):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((iters, B, 1, T)), dtype)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, 1, T), jnp.float32))
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    ms = amortized_ms(model.apply, params, xs)
    return B * (T / sr) / (ms / 1e3), model_mfu(model.apply, params, xs[0], ms)


def main():
    from dnn_based_source_separation_tpu.models import (
        ConvTasNet, DPRNNTasNet, DPTNet, GALRNet, LSTMTasNet, SepFormer,
        OpenUnmix,
    )

    rows = []

    conv = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=False, n_sources=2,
    )
    rows.append(("Conv-TasNet (paper, f32)", *bench_waveform_model(conv, 8, 32000, 8000, jnp.float32)))
    rows.append(("Conv-TasNet (paper, bf16)", *bench_waveform_model(conv, 8, 32000, 8000, jnp.bfloat16)))
    rows.append(("Conv-TasNet (serving batch 32, bf16)", *bench_waveform_model(conv, 32, 32000, 8000, jnp.bfloat16, iters=4)))

    dprnn = DPRNNTasNet(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        causal=False, n_sources=2,
    )
    rows.append(("DPRNN-TasNet (recipe, bf16)", *bench_waveform_model(dprnn, 4, 32000, 8000, jnp.bfloat16, iters=4)))

    sep = SepFormer(
        n_basis=256, kernel_size=16, stride=8, enc_nonlinear="relu",
        sep_bottleneck_channels=256, sep_chunk_size=250, sep_hop_size=125,
        sep_num_blocks=2, sep_num_layers_intra=8, sep_num_layers_inter=8,
        sep_num_heads_intra=8, sep_num_heads_inter=8,
        sep_d_ff_intra=1024, sep_d_ff_inter=1024, n_sources=2,
    )
    rows.append(("SepFormer (recipe, bf16)", *bench_waveform_model(sep, 4, 32000, 8000, jnp.bfloat16, iters=4)))

    dpt = DPTNet(
        n_basis=64, kernel_size=2, stride=1, enc_nonlinear="relu",
        sep_bottleneck_channels=64, sep_hidden_channels=256,
        sep_chunk_size=100, sep_num_blocks=6, sep_num_heads=4,
        mask_nonlinear="relu", n_sources=2,
    )
    rows.append(("DPTNet (recipe, bf16)", *bench_waveform_model(dpt, 4, 32000, 8000, jnp.bfloat16, iters=4)))

    galr = GALRNet(
        n_basis=64, kernel_size=16, stride=8, enc_nonlinear="relu",
        sep_hidden_channels=128, sep_chunk_size=100, sep_hop_size=50,
        sep_down_chunk_size=32, sep_num_blocks=6, sep_num_heads=8,
        mask_nonlinear="relu", n_sources=2,
    )
    rows.append(("GALRNet (recipe, bf16)", *bench_waveform_model(galr, 4, 32000, 8000, jnp.bfloat16, iters=4)))

    lstm = LSTMTasNet(
        n_basis=500, kernel_size=40, stride=20, enc_basis="trainableGated",
        dec_basis="trainable", sep_num_blocks=2, sep_num_layers=2,
        sep_hidden_channels=500, mask_nonlinear="softmax", n_sources=2,
    )
    rows.append(("LSTM-TasNet (recipe, bf16)", *bench_waveform_model(lstm, 8, 32000, 8000, jnp.bfloat16, iters=4)))

    # UMX spectrogram path: 6 s stereo @ 44.1k -> (B, 2, 2049, 259)
    umx = OpenUnmix(in_channels=2, hidden_channels=512, num_layers=3,
                    n_bins=2049, max_bin=1487)
    B, F, S = 8, 2049, 259
    rng = np.random.default_rng(1)
    xs = jnp.asarray(np.abs(rng.standard_normal((4, B, 2, F, S))), jnp.bfloat16)
    vars_ = umx.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, F, S), jnp.float32))
    vars_ = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(umx.apply, vars_, xs)
    rows.append(("Open-Unmix (paper cfg, bf16)", B * 6.0 / (ms / 1e3),
                 model_mfu(umx.apply, vars_, xs[0], ms)))

    # X-UMX: 4 bridged UMX backbones, (B, 1, C, F, S) stereo input.
    from dnn_based_source_separation_tpu.models import CrossNetOpenUnmix

    xumx = CrossNetOpenUnmix(in_channels=2, hidden_channels=512, num_layers=3,
                             n_bins=2049, max_bin=1487)
    B = 4
    xs = jnp.asarray(np.abs(rng.standard_normal((4, B, 1, 2, F, S))), jnp.bfloat16)
    vars_ = xumx.init(jax.random.PRNGKey(0), jnp.zeros((B, 1, 2, F, S), jnp.float32))
    vars_ = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(xumx.apply, vars_, xs)
    rows.append(("X-UMX (paper cfg, bf16)", B * 6.0 / (ms / 1e3),
                 model_mfu(xumx.apply, vars_, xs[0], ms)))

    # D3Net vocals (paper band config), 256-frame patches @ 44.1k/4096-hop.
    from dnn_based_source_separation_tpu.utils.config import build_d3net_from_config

    d3 = build_d3net_from_config(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "egs/musdb18/d3net/config/vocals.yaml"))
    B, Fd, Sd = 2, 2049, 256
    xs = jnp.asarray(np.abs(rng.standard_normal((2, B, 2, Fd, Sd))), jnp.bfloat16)
    vars_ = d3.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, Fd, Sd), jnp.float32))
    vars_ = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(lambda p, x: d3.apply(p, x), vars_, xs)
    sec_per_patch = Sd * 1024 / 44100  # hop 1024 (reference d3net config)
    rows.append(("D3Net vocals (paper cfg, bf16)", B * sec_per_patch / (ms / 1e3),
                 model_mfu(lambda p, x: d3.apply(p, x), vars_, xs[0], ms)))

    lines = [
        "# Inference throughput (single TPU v5e chip)",
        "",
        "Amortized on-device timing (lax.scan over batches, one host fetch);",
        "recipe-scale configurations. audio-seconds processed per second:",
        "",
        "| Model | RTF (audio-sec/sec/chip) | MFU |",
        "|---|---|---|",
    ]
    for name, rtf, mfu in rows:
        print(f"{name}: {rtf:.0f}x realtime, {mfu:.1%} MFU", flush=True)
        lines.append(f"| {name} | {rtf:.0f} | {mfu:.1%} |")
    lines += [
        "",
        "Batch 8 is Conv-TasNet's single-chip sweet spot: batch 32 *lowers*",
        "throughput because the TDCN's activation working set leaves on-chip",
        "memory -- scale serving with more chips, not batch.",
        "",
        "The reference publishes no throughput numbers; its only perf",
        "surface is recipe SDR tables (BASELINE.md). The project's north",
        "star (>=10x realtime Conv-TasNet inference per chip) is exceeded",
        f"by {rows[1][1] / 10:.0f}x in bf16.",
        "",
        "Reproduce: `python scripts/bench_models.py` (or `python bench.py`",
        "for the single headline JSON line).",
    ]
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    # Preserve the hand-written kernel-notes section across regeneration.
    bench_path = os.path.join(root, "BENCHMARKS.md")
    notes = ""
    if os.path.exists(bench_path):
        old = open(bench_path).read()
        for marker in ("## Training-step throughput", "## Long-form inference",
                       "## Streaming latency", "## Kernel notes"):
            if marker in old:  # preserve hand-written sections
                notes = "\n" + old[old.index(marker):]
                break
    with open(bench_path, "w") as f:
        f.write("\n".join(lines) + "\n" + notes)
    print("wrote BENCHMARKS.md", flush=True)


if __name__ == "__main__":
    main()
