"""Streaming-inference latency benchmark (causal Conv-TasNet, single chip).

Measures end-to-end per-block latency of the stateful chunk API
(models/streaming.py) — host roundtrip included, which is the number a
realtime caller sees. Usage: python scripts/bench_streaming.py
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


def main():
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.models.streaming import StreamingSeparator

    sr = 8000
    model = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=True, n_sources=2,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, sr), jnp.float32))

    rng = np.random.default_rng(0)
    for hop_ms in (16, 32, 64):
        hop = sr * hop_ms // 1000
        stream = StreamingSeparator(model, params, hop_samples=hop,
                                    context_samples=2 * sr)
        block = (0.1 * rng.standard_normal((1, hop))).astype(np.float32)
        for _ in range(3):
            stream.process(block)  # compile + settle
        ts = []
        for _ in range(50):
            s = time.perf_counter()
            stream.process(block)
            ts.append(time.perf_counter() - s)
        lat = float(np.median(ts)) * 1e3
        print(f"hop {hop_ms:3d} ms: {lat:6.2f} ms/block median "
              f"({'realtime' if lat < hop_ms else 'NOT realtime'}, "
              f"{hop_ms / lat:.1f}x margin)", flush=True)


if __name__ == "__main__":
    main()
