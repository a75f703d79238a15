"""Benchmark: Conv-TasNet wsj0-2mix inference real-time factor on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md §6); the project
target is >= 10x real-time audio-seconds/sec per chip for the paper-config
Conv-TasNet (BASELINE.md "Targets"). vs_baseline = value / 10.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 8000
BATCH = 8
SECONDS = 4.0
WARMUP = 3
ITERS = 20


def main():
    from __graft_entry__ import _flagship

    model = _flagship()
    T = int(SAMPLE_RATE * SECONDS)
    rng = np.random.default_rng(0)
    inputs = [
        jnp.asarray(rng.standard_normal((BATCH, 1, T)), jnp.float32)
        for _ in range(WARMUP + ITERS)
    ]
    params = model.init(jax.random.PRNGKey(0), inputs[0])

    # Reduce to a scalar fetched to host each iteration: on remote-tunneled
    # backends block_until_ready can return at dispatch-ack, so a host
    # transfer is the only reliable execution barrier.
    fwd = jax.jit(lambda p, x: jnp.sum(model.apply(p, x)))
    for i in range(WARMUP):
        float(fwd(params, inputs[i]))

    times = []
    for i in range(ITERS):
        start = time.perf_counter()
        float(fwd(params, inputs[WARMUP + i]))
        times.append(time.perf_counter() - start)

    per_batch = float(np.median(times))
    rtf = BATCH * SECONDS / per_batch
    print(json.dumps({
        "metric": "conv_tasnet_wsj0mix_inference_rtf",
        "value": round(rtf, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(rtf / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
