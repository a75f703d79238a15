"""Benchmark: Conv-TasNet wsj0-2mix inference real-time factor on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md §6); the project
target is >= 10x real-time audio-seconds/sec per chip for the paper-config
Conv-TasNet (BASELINE.md "Targets"). vs_baseline = value / 10.

Methodology:
  * bf16 inference (params + activations). The masking head is a sigmoid;
    measured output deviation vs f32 is ~1.3% relative (~38 dB SNR against
    the f32 output), far below the model's own ~15-20 dB SI-SDR -- i.e.
    separation quality is unaffected.
  * ITERS forwards are chained in one lax.scan and reduced to a single
    fetched scalar, so the remote tunnel's fixed per-call latency (~25 ms)
    amortizes away and the number reflects on-device throughput.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 8000
BATCH = 8
SECONDS = 4.0
WARMUP = 2
ITERS = 20


def main():
    from __graft_entry__ import _flagship

    model = _flagship()
    T = int(SAMPLE_RATE * SECONDS)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((ITERS, BATCH, 1, T)), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((BATCH, 1, T), jnp.float32))
    # Inference-time gLN affine folding, 'heads' mode (models/fold.py):
    # pure algebra (parity-tested, tests/test_fold.py), measured +5% RTF /
    # +0.9pt MFU at this config (BENCHMARKS.md "gLN affine folding").
    from dnn_based_source_separation_tpu.models.fold import fold_gln_affine
    model, params = fold_gln_affine(model, params, mode="heads")
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    # params must flow through the jit ARGUMENT (p), not the closure —
    # closed-over arrays are baked into the graph as constants, which both
    # risks OOMing the remote compile helper and measurably slows the
    # compiled scan (~30% on this model).
    many = jax.jit(
        lambda p, xs: jax.lax.scan(
            lambda c, x: (c + jnp.sum(model.apply(p, x).astype(jnp.float32)), None),
            jnp.float32(0.0), xs,
        )[0]
    )
    for _ in range(WARMUP):
        float(many(params, xs))

    times = []
    for _ in range(5):
        start = time.perf_counter()
        float(many(params, xs))
        times.append(time.perf_counter() - start)

    # Fixed per-blocking-call harness cost (dispatch + scalar fetch; ~25-30 ms
    # through the remote tunnel, ~0 on a locally-attached chip) — subtracted
    # so the number reflects on-device compute.
    trivial = jax.jit(lambda s: s * 1.0 + 1.0)
    float(trivial(jnp.float32(0.0)))
    floors = []
    for _ in range(20):
        start = time.perf_counter()
        float(trivial(jnp.float32(0.0)))
        floors.append(time.perf_counter() - start)
    floor = float(np.median(floors))

    per_batch = max((float(np.median(times)) - floor) / ITERS,
                    0.05 * float(np.median(times)) / ITERS)
    rtf = BATCH * SECONDS / per_batch

    # MFU: analytic FLOPs of one forward (XLA cost model) over chip peak.
    peak = {
        "TPU v4": 275e12, "TPU v5 lite": 197e12, "TPU v5": 459e12,
        "TPU v5p": 459e12, "TPU v6 lite": 918e12,
    }.get(jax.devices()[0].device_kind, 197e12)
    mfu = float("nan")
    try:
        one = jax.jit(model.apply).lower(params, xs[0]).compile()
        flops = float(one.cost_analysis()["flops"])
        mfu = flops / per_batch / peak
    except Exception:
        pass

    print(json.dumps({
        "metric": "conv_tasnet_wsj0mix_inference_rtf",
        "value": round(rtf, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(rtf / 10.0, 3),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
