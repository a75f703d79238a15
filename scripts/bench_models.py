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
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


_FLOOR_MS = None


def harness_floor_ms():
    """Fixed per-blocking-call cost of this harness (dispatch + scalar fetch;
    ~25-30 ms through the remote tunnel, ~0 on a locally-attached chip).
    Subtracted as floor/iters from every amortized row so reported times are
    on-device compute, not host-fetch overhead."""
    global _FLOOR_MS
    if _FLOOR_MS is None:
        f = jax.jit(lambda s: s * 1.0 + 1.0)
        x = jnp.float32(0.0)
        float(f(x))
        ts = []
        for _ in range(20):
            s = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - s)
        _FLOOR_MS = float(np.median(ts)) * 1e3
        print(f"  [stage] harness per-call floor: {_FLOOR_MS:.1f} ms", flush=True)
    return _FLOOR_MS


def amortized_ms(apply_fn, params, xs):
    many = jax.jit(
        lambda p, xs: jax.lax.scan(
            lambda c, x: (c + jnp.sum(apply_fn(p, x).astype(jnp.float32)), None),
            jnp.float32(0.0), xs,
        )[0]
    )
    print("  [stage] scan compile...", flush=True)
    float(many(params, xs))
    float(many(params, xs))
    print("  [stage] scan timing...", flush=True)
    ts = []
    for _ in range(4):
        s = time.perf_counter()
        float(many(params, xs))
        ts.append(time.perf_counter() - s)
    raw = float(np.median(ts)) / xs.shape[0] * 1e3
    return max(raw - harness_floor_ms() / xs.shape[0], 0.05 * raw)


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
    print(f"  [stage] init {type(model).__name__}...", flush=True)
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
    rows.append(("Conv-TasNet (paper, f32)", *bench_waveform_model(conv, 8, 32000, 8000, jnp.float32, iters=16)))
    rows.append(("Conv-TasNet (paper, bf16)", *bench_waveform_model(conv, 8, 32000, 8000, jnp.bfloat16, iters=16)))
    rows.append(("Conv-TasNet (serving batch 32, bf16)", *bench_waveform_model(conv, 32, 32000, 8000, jnp.bfloat16, iters=4)))

    dprnn = DPRNNTasNet(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        causal=False, n_sources=2,
    )
    rows.append(("DPRNN-TasNet (recipe, bf16)", *bench_waveform_model(dprnn, 4, 32000, 8000, jnp.bfloat16, iters=4)))

    # Same topology with the SRU parallel-prefix recurrence (rnn_type='sru',
    # ops/rnn.py:SRU): no sequential dependency chain -> measures what the
    # ~14 us/step LSTM recurrence floor costs the dual-path family.
    dprnn_sru = DPRNNTasNet(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        rnn_type="sru", causal=False, n_sources=2,
    )
    rows.append(("DPRNN-TasNet (recipe, SRU recurrence, bf16)", *bench_waveform_model(dprnn_sru, 4, 32000, 8000, jnp.bfloat16, iters=16)))

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
    rows.append(("GALRNet (recipe, bf16)", *bench_waveform_model(galr, 4, 32000, 8000, jnp.bfloat16, iters=32)))

    lstm = LSTMTasNet(
        n_basis=500, kernel_size=40, stride=20, enc_basis="trainableGated",
        dec_basis="trainable", sep_num_blocks=2, sep_num_layers=2,
        sep_hidden_channels=500, mask_nonlinear="softmax", n_sources=2,
    )
    rows.append(("LSTM-TasNet (recipe, bf16)", *bench_waveform_model(lstm, 8, 32000, 8000, jnp.bfloat16, iters=16)))

    # UMX spectrogram path: 6 s stereo @ 44.1k -> (B, 2, 2049, 259)
    umx = OpenUnmix(in_channels=2, hidden_channels=512, num_layers=3,
                    n_bins=2049, max_bin=1487)
    B, F, S = 8, 2049, 259
    rng = np.random.default_rng(1)
    xs = jnp.asarray(np.abs(rng.standard_normal((64, B, 2, F, S))), jnp.bfloat16)
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
    xs = jnp.asarray(np.abs(rng.standard_normal((32, B, 1, 2, F, S))), jnp.bfloat16)
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

    # ---- round 3: full-zoo coverage (no flagship family ships untimed) ----
    root_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    def bench_spec(model, B, F, S, sec_per_frame, dtype=jnp.bfloat16, iters=2,
                   has_stats=True):
        """(B, C, F, S) amplitude-spectrogram models; RTF in audio-sec/s."""
        rng2 = np.random.default_rng(7)
        xs = jnp.asarray(np.abs(rng2.standard_normal((iters, B, 2, F, S))), dtype)
        vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, F, S), jnp.float32))
        if dtype == jnp.bfloat16:
            vars_ = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
        ms = amortized_ms(model.apply, vars_, xs)
        return B * S * sec_per_frame / (ms / 1e3), model_mfu(model.apply, vars_, xs[0], ms)

    from dnn_based_source_separation_tpu.utils.config import (
        build_mmdenselstm_from_config, build_mmdensenet_from_config)

    # MMDenseNet paper cfg: 2048-FFT (1025 bins), hop 1024 @ 44.1 kHz.
    mmdn = build_mmdensenet_from_config(
        os.path.join(root_dir, "egs/musdb18/mm-densenet/config/paper.yaml"))
    rows.append(("MMDenseNet (paper cfg, bf16)",
                 *bench_spec(mmdn, 2, 1025, 256, 1024 / 44100, iters=4)))

    # MMDenseLSTM paper cfg: 4096-FFT (2049 bins), hop 2048 @ 44.1 kHz.
    mmdl = build_mmdenselstm_from_config(
        os.path.join(root_dir, "egs/musdb18/mm-dense-lstm/config/paper.yaml"))
    rows.append(("MMDenseLSTM (paper cfg, bf16)",
                 *bench_spec(mmdl, 2, 2049, 128, 2048 / 44100, iters=4)))

    # HRNet recipe cfg: 4096-FFT, hop 1024 @ 44.1 kHz, per-target model.
    from dnn_based_source_separation_tpu.models.hrnet import HRNet

    hr = HRNet(in_channels=2, hidden_channels=(16, 32, 64))
    rows.append(("HRNet (recipe, bf16)", *bench_spec(hr, 2, 2049, 192, 1024 / 44100, iters=4)))

    # MRX (cocktail-fork): waveform stereo 44.1 kHz, 3 STFT resolutions.
    from dnn_based_source_separation_tpu.models.mrx import MultiResolutionCrossNet

    mrx = MultiResolutionCrossNet(in_channels=2, hidden_channels=512, num_layers=3,
                                  n_fft=(512, 1024, 2048), hop_length=256)
    B, T, sr = 2, 4 * 44100, 44100
    rng = np.random.default_rng(8)
    xs = jnp.asarray(rng.standard_normal((2, B, 2, T)), jnp.bfloat16)
    vars_ = mrx.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, T), jnp.float32))
    vars_ = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(mrx.apply, vars_, xs)
    rows.append(("MRX (recipe, bf16)", B * T / sr / (ms / 1e3),
                 model_mfu(mrx.apply, vars_, xs[0], ms)))

    # CUNet (FiLM-conditioned U-Net): 1024-FFT (513 bins), hop 768, patch 128.
    from dnn_based_source_separation_tpu.models.cunet import ConditionedUNet2d

    cu = ConditionedUNet2d(channels=(2, 16, 32, 64, 128, 256), kernel_size=(5, 5),
                           stride=(2, 2), control_channels=(4, 16, 64),
                           conditioning="film", masking=True)
    B, F, S = 4, 513, 128
    xs = jnp.asarray(np.abs(np.random.default_rng(9).standard_normal((32, B, 2, F, S))), jnp.bfloat16)
    cond = jnp.asarray(np.eye(4, dtype=np.float32)[:B])
    cu_apply = lambda p, x: cu.apply(p, x, cond)
    vars_ = cu.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, F, S), jnp.float32), cond)
    vars_ = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(cu_apply, vars_, xs)
    rows.append(("CUNet (recipe, bf16)", B * S * 768 / 44100 / (ms / 1e3),
                 model_mfu(cu_apply, vars_, xs[0], ms)))

    # Meta-TasNet single stage (recipe: N440 L20 H160 B160 Sc160 X8 R3, 8 kHz).
    from dnn_based_source_separation_tpu.models.meta_tasnet import MetaTasNet

    meta = MetaTasNet(n_basis=440, kernel_size=20, sep_hidden_channels=160,
                      sep_bottleneck_channels=160, sep_skip_channels=160,
                      sep_num_blocks=3, sep_num_layers=8, n_sources=4)
    rows.append(("Meta-TasNet (recipe stage, bf16)",
                 *bench_waveform_model(meta, 4, 64000, 8000, jnp.bfloat16, iters=4)))

    # Wavesplit (recipe cfg, 0.75 s segments @ 8 kHz, KMeans inference).
    from dnn_based_source_separation_tpu.models.wavesplit import WaveSplit

    ws = WaveSplit()
    B, T = 4, 6000
    xs = jnp.asarray(np.random.default_rng(10).standard_normal((4, B, 1, T)), jnp.bfloat16)
    vars_ = ws.init(jax.random.PRNGKey(0), jnp.zeros((B, 1, T), jnp.float32))
    vars_ = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(ws.apply, vars_, xs)
    rows.append(("Wavesplit (recipe, bf16)", B * T / 8000 / (ms / 1e3),
                 model_mfu(ws.apply, vars_, xs[0], ms)))

    # DANet (wsj0 recipe: 256-FFT/64-hop @ 8 kHz, KMeans inference path).
    from dnn_based_source_separation_tpu.models.danet import DANet

    da = DANet(n_bins=129)
    B, F, S = 8, 129, 500  # 4 s per utterance
    da_apply = lambda p, x: da.apply(p, x, n_sources=2)
    xs = jnp.asarray(np.abs(np.random.default_rng(11).standard_normal((16, B, 1, F, S))), jnp.bfloat16)
    vars_ = da.init(jax.random.PRNGKey(0), jnp.zeros((B, 1, F, S), jnp.float32), n_sources=2)
    vars_ = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vars_)
    ms = amortized_ms(da_apply, vars_, xs)
    rows.append(("DANet (recipe, KMeans inference, bf16)",
                 B * S * 64 / 8000 / (ms / 1e3), model_mfu(da_apply, vars_, xs[0], ms)))

    lines = [
        "# Inference throughput (single TPU v5e chip)",
        "",
        "Amortized on-device timing: lax.scan over 4-64 batches, one host",
        "fetch, with the harness's fixed per-call cost (~27-30 ms through",
        "this environment's remote tunnel; measured each run) subtracted —",
        "reported numbers are on-device compute at recipe-scale configs.",
        "audio-seconds processed per second:",
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
        'What bounds each family (measured — details in "Kernel notes" below):',
        "",
        "| Family | Bound | Evidence |",
        "|---|---|---|",
        "| Conv-TasNet / Meta-TasNet | VPU pointwise throughput (gLN stats + PReLU per element), not HBM | bf16 buys only 8% over f32 on the TDCN |",
        "| DPRNN / DPTNet / LSTM-TasNet | sequential recurrence dependency (~14 us/step at full-width batches) | unroll probe: loop machinery removal changes nothing |",
        "| SepFormer | healthy MXU mix (14.8% MFU) | attention+FFN matmuls dominate |",
        "| UMX / X-UMX | dense path at 60.9% MFU; LSTM stack 62% of forward | probe_umx_galr stage split |",
        "| GALRNet | intra biLSTM ~2.4x the low-dim attention half | per-block stage split |",
        "| D3Net / MMDense* / CUNet / HRNet / MRX | small-channel (13-66) lane underutilization: convs fill <1/4 of the 128-wide tile | 32→66 conv at 2.4% MFU vs 128→128 at 15.5%; BN/ReLU fuse free |",
        "| Wavesplit | MXU-dense speaker+separation stacks (23.1% MFU) | best MFU in the zoo |",
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
