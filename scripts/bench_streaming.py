"""Streaming-inference latency benchmark (causal Conv-TasNet, single chip).

Two measurements per hop size:
  * host path: per-block latency of the stateful chunk API
    (models/streaming.py) — host roundtrip included, which in THIS
    environment is dominated by the remote tunnel's ~25-30 ms per call;
  * on-device: a lax.scan chain of >=100 sequential chunk steps (carry =
    rolling context buffer) in ONE dispatch, wall / steps — the true
    per-block compute latency a locally-attached chip delivers
    (round-2 verdict #8: measured, not inferred).
Usage: python scripts/bench_streaming.py
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


def _flagship_causal(sr):
    from dnn_based_source_separation_tpu.models import ConvTasNet

    return ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=True, n_sources=2,
    )


def bench_multistream(hop_ms: int = 16, stream_counts=(16, 64, 256), n_blocks=50):
    """Concurrent-stream serving capacity of the exact-streaming path.

    vmaps ExactStreamingSeparator's pure step over M independent streams
    (M state trees advance together), scans 50 sequential blocks in one
    dispatch, and reports ms/block per M. Realtime requires ms/block <=
    hop; the largest M that satisfies it is the measured streams-per-chip
    capacity at this block latency.
    """
    from dnn_based_source_separation_tpu.models.streaming import (
        ExactStreamingSeparator,
    )

    sr = 8000
    model = _flagship_causal(sr)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, sr), jnp.float32))
    hop = sr * hop_ms // 1000
    L, S = model.kernel_size, model.stride
    es = ExactStreamingSeparator(model, params, hop_samples=hop)
    es._prime(jnp.zeros((1, hop + L - S), jnp.float32))
    st0 = es._state

    rng = np.random.default_rng(3)
    N = n_blocks
    print(f"multi-stream exact serving (hop {hop_ms} ms):", flush=True)
    for M in stream_counts:
        blocks = jnp.asarray(
            0.1 * rng.standard_normal((N, M, 1, hop)), jnp.float32)
        stM = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (M,) + a.shape), st0)
        step_v = jax.vmap(es.step, in_axes=(None, 0, 0, 0, 0))

        def chain(p, blocks, stM):
            def scan_step(carry, block):
                st, enc_c, tail, wd = carry
                x = jnp.concatenate([enc_c, block], axis=-1)
                emitted, st, tail, wd = step_v(p, st, x, tail, wd)
                return ((st, x[..., -(L - S):], tail, wd),
                        jnp.sum(emitted.astype(jnp.float32)))

            carry0 = (stM, jnp.zeros((M, 1, L - S), jnp.float32),
                      jnp.zeros((M, model.n_sources, L - S), jnp.float32),
                      jnp.zeros((M, 1, 0, model.n_basis), jnp.float32))
            _, outs = jax.lax.scan(scan_step, carry0, blocks)
            return outs[-1]

        chain_jit = jax.jit(chain)
        float(chain_jit(params, blocks, stM))
        ts = []
        for _ in range(4):
            s = time.perf_counter()
            float(chain_jit(params, blocks, stM))
            ts.append(time.perf_counter() - s)
        f = jax.jit(lambda s: s * 1.0 + 2.0)
        float(f(jnp.float32(0.0)))
        fs = []
        for _ in range(10):
            s = time.perf_counter()
            float(f(jnp.float32(0.0)))
            fs.append(time.perf_counter() - s)
        lat = max(float(np.median(ts)) - float(np.median(fs)), 0.0) / N * 1e3
        ok = "realtime" if lat <= hop_ms else "OVER BUDGET"
        print(f"  M={M:4d} streams: {lat:6.2f} ms/block "
              f"({hop_ms / lat:5.1f}x margin, {lat / M * 1e3:6.1f} us/stream) "
              f"[{ok}]", flush=True)


def main():
    from dnn_based_source_separation_tpu.models.streaming import StreamingSeparator

    sr = 8000
    model = _flagship_causal(sr)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, sr), jnp.float32))

    rng = np.random.default_rng(0)
    context = 2 * sr
    for hop_ms in (8, 16, 32, 64):
        hop = sr * hop_ms // 1000
        stream = StreamingSeparator(model, params, hop_samples=hop,
                                    context_samples=context)
        block = (0.1 * rng.standard_normal((1, hop))).astype(np.float32)
        for _ in range(3):
            stream.process(block)  # compile + settle
        ts = []
        for _ in range(50):
            s = time.perf_counter()
            stream.process(block)
            ts.append(time.perf_counter() - s)
        lat = float(np.median(ts)) * 1e3

        # On-device chain: N sequential chunk steps in one dispatch. The
        # carry is the rolling context buffer — each step depends on the
        # previous one exactly as a realtime stream does.
        N = 100
        blocks = jnp.asarray(
            0.1 * rng.standard_normal((N, 1, hop)), jnp.float32)

        def chain(p, blocks):
            def step(ctx, block):
                x = jnp.concatenate([ctx, block], axis=-1)  # (1, ctx+hop)
                est = model.apply(p, x[None])[0][..., -hop:]
                return x[:, -context:], jnp.sum(est.astype(jnp.float32))
            _, outs = jax.lax.scan(step, jnp.zeros((1, context), jnp.float32), blocks)
            return outs[-1]

        chain_jit = jax.jit(chain)
        float(chain_jit(params, blocks))  # compile
        ts = []
        for _ in range(4):
            s = time.perf_counter()
            float(chain_jit(params, blocks))
            ts.append(time.perf_counter() - s)
        # Subtract the fixed per-call harness cost (~27-30 ms tunnel
        # dispatch+fetch) amortized over the N in-dispatch steps.
        f = jax.jit(lambda s: s * 1.0 + 1.0)
        float(f(jnp.float32(0.0)))
        fs = []
        for _ in range(20):
            s = time.perf_counter()
            float(f(jnp.float32(0.0)))
            fs.append(time.perf_counter() - s)
        floor = float(np.median(fs))
        dev_lat = max(float(np.median(ts)) - floor, 0.0) / N * 1e3

        # Exact-streaming chain: the same N sequential steps through the
        # per-layer-state path, reusing ExactStreamingSeparator's OWN pure
        # step function (exactly the shipped serving semantics — cLN running
        # stats + conv left contexts + encoder framing/decoder OLA carries),
        # which processes hop+L-S samples per step instead of the 2 s
        # rolling window: both exact w.r.t. offline AND cheaper per block.
        from dnn_based_source_separation_tpu.models.streaming import (
            ExactStreamingSeparator,
        )

        L, S = model.kernel_size, model.stride
        es = ExactStreamingSeparator(model, params, hop_samples=hop)
        es._prime(jnp.zeros((1, hop + L - S), jnp.float32))
        st0 = es._state

        def exact_chain(p, blocks):
            # carry = (stream state, encoder sample carry, decoder OLA tail);
            # each scanned step consumes carry+block = hop+L-S samples, the
            # steady-state shape of the serving wrapper.
            def scan_step(carry, block):
                st, enc_c, tail, wd = carry
                x = jnp.concatenate([enc_c, block], axis=-1)
                emitted, st, tail, wd = es.step(p, st, x, tail, wd)
                return ((st, x[:, -(L - S):], tail, wd),
                        jnp.sum(emitted.astype(jnp.float32)))

            carry0 = (st0, jnp.zeros((1, L - S), jnp.float32),
                      jnp.zeros((model.n_sources, L - S), jnp.float32),
                      jnp.zeros((1, 0, model.n_basis), jnp.float32))
            _, outs = jax.lax.scan(scan_step, carry0, blocks)
            return outs[-1]

        exact_jit = jax.jit(exact_chain)
        float(exact_jit(params, blocks))
        ts_e = []
        for _ in range(4):
            s = time.perf_counter()
            float(exact_jit(params, blocks))
            ts_e.append(time.perf_counter() - s)
        ex_lat = max(float(np.median(ts_e)) - floor, 0.0) / N * 1e3

        print(f"hop {hop_ms:3d} ms: host {lat:6.2f} ms/block "
              f"({hop_ms / lat:.1f}x margin) | on-device {dev_lat:6.2f} ms/block "
              f"({hop_ms / dev_lat:.1f}x realtime margin) | exact-stream "
              f"{ex_lat:6.2f} ms/block ({hop_ms / max(ex_lat, 1e-9):.1f}x)",
              flush=True)


if __name__ == "__main__":
    if "--knee" in sys.argv:
        # Round-3 verdict item 7: find the capacity knee past M=256. Fewer
        # sequential blocks per dispatch (same measured quantity — ms/block
        # amortizes over the scan) keeps the remote compile inside budget,
        # and the persistent compile cache amortizes re-runs.
        bench_multistream(stream_counts=(256, 512, 1024), n_blocks=16)
    elif "--streams" in sys.argv:
        bench_multistream()
    else:
        main()
