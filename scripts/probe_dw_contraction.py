"""Probe the TDCN backward's dW = x^T dy contractions (round-5 item 4b).

The Conv-TasNet paper-config train step spends its backward excess (over
the 2.1x-FLOPs ideal) partly in the weight-gradient contractions: at
B=8 x 4 s the 1x1 matmuls see K = B*T' = 32k contracted rows, giving
skinny (128,32k)x(32k,512) / (512,32k)x(32k,128) products whose HBM
traffic (re-reading saved activations + upstream grads) rivals their MXU
time. This probe times isolated variants at the exact hot shapes:

  baseline   einsum('tc,td->cd') f32-accum        (what autodiff emits)
  bf16accum  preferred_element_type=bfloat16      (halves accum width)
  splitk     batched partial sums over K chunks   (different tiling)
  fused      dx and dW from ONE pass over dy      (dot_general pair; XLA
             may or may not share the dy read)

Each variant is timed as a 50-iteration lax.scan consuming its carry,
ending in a scalar fetch (tunnel discipline, see BENCHMARKS.md
"Measurement floor"). Roofline context printed per shape.

Run on the TPU chip: python scripts/probe_dw_contraction.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 500
# (rows K, C_in, C_out): bottleneck and head shapes at paper B=8 x 4 s.
SHAPES = [(32000, 128, 512), (32000, 512, 128)]
HBM_GBPS = 819.0  # v5e spec
PEAK_TFLOPS = 197.0  # v5e bf16


_FLOOR = None


def harness_floor():
    """Fixed per-blocking-call cost of this environment's tunnel."""
    global _FLOOR
    if _FLOOR is None:
        trivial = jax.jit(lambda s: s * 1.0 + 1.0)
        float(trivial(jnp.float32(0.0)))
        import numpy as _np

        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(trivial(jnp.float32(0.0)))
            ts.append(time.perf_counter() - t0)
        _FLOOR = float(_np.median(ts))
        print(f"[harness floor {_FLOOR * 1e3:.1f} ms/call]")
    return _FLOOR


def timed(fn, *args):
    out = fn(*args)
    sum(float(jnp.sum(a[..., 0, 0])) for a in jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    out = fn(*args)
    # scalar fetch as the barrier (block_until_ready is unreliable here)
    s = sum(float(jnp.sum(a[..., 0, 0])) for a in jax.tree_util.tree_leaves(out))
    dt = time.perf_counter() - t0 - harness_floor()
    del s
    return max(dt, 0.0)


def scan_variant(body, carry_shapes, xs_consts):
    """Build a jitted 50-step scan whose carry feeds the next iteration."""

    @jax.jit
    def run(*consts):
        def step(carry, _):
            new = body(carry, *consts)
            return new, ()

        init = tuple(jnp.zeros(s, jnp.bfloat16) for s in carry_shapes)
        final, _ = jax.lax.scan(step, init, None, length=ITERS)
        return final

    return functools.partial(run, *xs_consts)


def main():
    key = jax.random.PRNGKey(0)
    for K, Cin, Cout in SHAPES:
        kx, kd, kw = jax.random.split(key, 3)
        x = jax.random.normal(kx, (K, Cin), jnp.bfloat16)
        dy = jax.random.normal(kd, (K, Cout), jnp.bfloat16)
        w = jax.random.normal(kw, (Cin, Cout), jnp.bfloat16)

        flops_dw = 2 * K * Cin * Cout
        bytes_dw = 2 * K * (Cin + Cout)
        print(f"\n== dW shape ({Cin},{Cout}), K={K}: "
              f"MXU floor {flops_dw / PEAK_TFLOPS / 1e12 * 1e6:.1f} us, "
              f"HBM floor {bytes_dw / HBM_GBPS / 1e9 * 1e6:.1f} us ==")

        # carry perturbs x so the scan body cannot be hoisted
        def base(carry, x, dy):
            (acc,) = carry
            xs = x + acc[0, 0]
            dw = jnp.einsum("tc,td->cd", xs, dy,
                            preferred_element_type=jnp.float32)
            return (dw.astype(jnp.bfloat16),)

        def bf16accum(carry, x, dy):
            (acc,) = carry
            xs = x + acc[0, 0]
            dw = jnp.einsum("tc,td->cd", xs, dy,
                            preferred_element_type=jnp.bfloat16)
            return (dw,)

        def splitk(carry, x, dy, n=8):
            (acc,) = carry
            xs = (x + acc[0, 0]).reshape(n, K // n, Cin)
            dys = dy.reshape(n, K // n, Cout)
            part = jnp.einsum("ktc,ktd->kcd", xs, dys,
                              preferred_element_type=jnp.float32)
            return (part.sum(0).astype(jnp.bfloat16),)

        def fused(carry, x, dy, w):
            # the backward pair for one 1x1 matmul: dx = dy w^T, dW = x^T dy
            acc_dw, acc_dx = carry
            xs = x + acc_dw[0, 0]
            dys = dy + acc_dx[0, 0]
            dw = jnp.einsum("tc,td->cd", xs, dys,
                            preferred_element_type=jnp.float32)
            dx = jnp.einsum("td,cd->tc", dys, w,
                            preferred_element_type=jnp.float32)
            return dw.astype(jnp.bfloat16), dx.astype(jnp.bfloat16)

        def default(carry, x, dy):
            # what autodiff emits for a bf16 Dense: bf16 operands, no
            # explicit accumulation override (XLA picks f32 internally)
            (acc,) = carry
            xs = x + acc[0, 0]
            return (jnp.einsum("tc,td->cd", xs, dy),)

        variants = [
            ("autodiff-default bf16", scan_variant(default, [(Cin, Cout)], (x, dy))),
            ("explicit f32-accum", scan_variant(base, [(Cin, Cout)], (x, dy))),
            ("bf16-accum", scan_variant(bf16accum, [(Cin, Cout)], (x, dy))),
            ("split-K8", scan_variant(splitk, [(Cin, Cout)], (x, dy))),
        ]
        for name, fn in variants:
            dt = timed(fn)
            print(f"  {name:22s} {dt / ITERS * 1e6:8.1f} us/iter")

        fused_fn = scan_variant(fused, [(Cin, Cout), (K, Cin)], (x, dy, w))
        flops_pair = 2 * flops_dw
        bytes_pair_shared = 2 * (K * Cin * 2 + K * Cout)  # dy read once
        bytes_pair_unshared = 2 * (K * Cin * 2 + 2 * K * Cout)
        dt = timed(fused_fn)
        print(f"  {'dx+dW pair':22s} {dt / ITERS * 1e6:8.1f} us/iter "
              f"(pair MXU floor {flops_pair / PEAK_TFLOPS / 1e12 * 1e6:.1f} us, "
              f"HBM floor shared/unshared "
              f"{bytes_pair_shared / HBM_GBPS / 1e9 * 1e6:.1f}/"
              f"{bytes_pair_unshared / HBM_GBPS / 1e9 * 1e6:.1f} us)")


if __name__ == "__main__":
    main()
