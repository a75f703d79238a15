"""Probe: does unrolling the in-kernel fori_loop cut the per-step floor?

BENCHMARKS.md kernel notes: the LSTM recurrence costs ~13 us/sequential step
in every formulation, with a copy-only body costing the same — i.e. loop
machinery, not compute. If that machinery is per-iteration control overhead,
unrolling N steps per iteration should amortize it.

Usage: python scripts/probe_lstm_unroll.py
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import functools

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnn_based_source_separation_tpu.ops import pallas_lstm as PL


def run(B, T, H, dtype, unroll):
    four_h = 4 * H
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((B, T, four_h)) * 0.1, dtype)
    whh = jnp.asarray(rng.standard_normal((H, four_h)) * 0.1, dtype)

    _, chunk = PL._tile_plan(T, B, four_h, jnp.dtype(dtype).itemsize)
    T_pad = -(-T // chunk) * chunk
    xw_t = jnp.swapaxes(xw, 0, 1)
    if T_pad != T:
        xw_t = jnp.pad(xw_t, ((0, T_pad - T), (0, 0), (0, 0)))

    def kernel(xw_ref, whh_ref, hs_ref, cs_ref, h_ref, c_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        def step(i, _):
            xt = xw_ref[i]
            h = h_ref[:]
            gates = xt.astype(jnp.float32) + jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32)
            gi = jax.nn.sigmoid(gates[:, :H])
            gf = jax.nn.sigmoid(gates[:, H:2 * H])
            gg = jnp.tanh(gates[:, 2 * H:3 * H])
            go = jax.nn.sigmoid(gates[:, 3 * H:])
            c = gf * c_ref[:] + gi * gg
            h = go * jnp.tanh(c)
            h_ref[:] = h
            c_ref[:] = c
            hs_ref[i] = h.astype(hs_ref.dtype)
            cs_ref[i] = c.astype(cs_ref.dtype)
            return 0

        if unroll:
            # Mosaic fori_loop only supports unroll=1; unroll manually
            # (chunk is a static Python int).
            for i in range(chunk):
                step(i, 0)
        else:
            jax.lax.fori_loop(0, chunk, step, 0)

    f = pl.pallas_call(
        kernel,
        grid=(T_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, B, four_h), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, four_h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B, H), dtype),
            jax.ShapeDtypeStruct((T_pad, B, H), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)] * 2,
    )
    # Chain ITERS kernel calls in one scan and fetch ONE scalar: through the
    # remote tunnel block_until_ready is unreliable and per-call latency
    # dominates single launches.
    ITERS = 20
    def once(c, _):
        hs, _cs = f(xw_t * (1.0 + 0.0 * c), whh)
        return c + jnp.sum(hs[-1].astype(jnp.float32)), None
    g = jax.jit(lambda: jax.lax.scan(once, jnp.float32(0.0), None, length=ITERS)[0])
    float(g()); float(g())
    ts = []
    for _ in range(5):
        s = time.perf_counter()
        float(g())
        ts.append(time.perf_counter() - s)
    ms = float(np.median(ts)) * 1e3 / ITERS
    out = f(xw_t, whh)[0]
    print(f"B={B} T={T} H={H} {jnp.dtype(dtype).name} unroll={unroll}: "
          f"{ms:.2f} ms ({ms * 1e3 / T:.1f} us/step)", flush=True)
    return out


def main():
    B, T, H = 1028, 250, 128
    ref = None
    for unroll in (False, True):
        out = run(B, T, H, jnp.bfloat16, unroll)
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"  max |diff vs fori| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
