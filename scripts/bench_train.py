"""Training-step throughput benchmark (single chip or mesh).

Measures audio-seconds/sec through the FULL compiled training step
(forward + PIT loss + backward + clip + Adam) at recipe-scale configs —
the counterpart of the inference table in scripts/bench_models.py.
Usage: python scripts/bench_train.py
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


def bench_train(model, criterion, B, T, sr, steps=8, compute_dtype=None):
    from dnn_based_source_separation_tpu.train.steps import (
        make_optimizer, make_train_step,
    )

    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    rng = np.random.default_rng(0)
    mixture = jnp.asarray(rng.standard_normal((B, 1, T)), jnp.float32)
    sources = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mixture)
    opt_state = optimizer.init(variables["params"])
    step = make_train_step(model, criterion, optimizer, compute_dtype=compute_dtype)

    variables, opt_state, loss = step(variables, opt_state, mixture, sources)
    float(loss)  # compile + settle
    ts = []
    for _ in range(3):
        s = time.perf_counter()
        for _ in range(steps):
            variables, opt_state, loss = step(variables, opt_state, mixture, sources)
        float(loss)
        ts.append((time.perf_counter() - s) / steps)
    sec = float(np.median(ts))
    return B * (T / sr) / sec


def main():
    from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
    from dnn_based_source_separation_tpu.models import ConvTasNet, DPRNNTasNet

    crit = PIT1d(NegSISDR(), n_sources=2)

    conv = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=False, n_sources=2,
    )
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        rtf = bench_train(conv, crit, 4, 32000, 8000, compute_dtype=dt)
        print(f"train Conv-TasNet (paper, batch 4, {name}): {rtf:.0f} audio-sec/sec", flush=True)

    dprnn = DPRNNTasNet(
        n_basis=64, kernel_size=2, stride=1, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_bottleneck_channels=64, sep_hidden_channels=128,
        sep_chunk_size=250, sep_hop_size=125, sep_num_blocks=6,
        causal=False, n_sources=2,
    )
    rtf = bench_train(dprnn, crit, 2, 32000, 8000, steps=4, compute_dtype=jnp.bfloat16)
    print(f"train DPRNN-TasNet (recipe, batch 2, bf16): {rtf:.0f} audio-sec/sec", flush=True)


if __name__ == "__main__":
    main()
