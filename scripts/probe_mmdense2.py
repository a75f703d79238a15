"""Isolate the MMDenseNet DenseBlock's 5x glue tax (probe_mmdense.py #2).

probe_mmdense.py measured the low band's first DenseBlock at 1.91 ms while
its four bare convs sum to 0.37 ms, and BN/ReLU ablations account for only
0.2 ms. Candidates for the remaining ~1.3 ms: the split-accumulate's
lane-unaligned channel slicing (`x_residual[..., :c]` / `[..., c:]` at
offsets 14/16), the accumulate add, or fusion boundaries between chained
convs. Variants (all on the (2, 512, 256, 32) input, bf16):

  block        — real DenseBlock (norm+relu off: isolate structure)
  seq_convs    — the same 4 convs chained with NO slicing/accumulate
                 (32->62->48->32->16): chained-conv floor
  slice_only   — seq_convs + a [..., :c]/[..., c:] split and re-add per
                 layer (the block's slicing pattern on the same tensors)
  concat_form  — dense block re-expressed torch-DenseNet-style: keep a
                 LIST of layer outputs, each conv input = concat of
                 prior outputs' needed segments (one concat per layer,
                 no running-residual slicing)

Usage: python scripts/probe_mmdense2.py
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

PEAK = 197e12

_FLOOR = [None]


def _floor_ms():
    if _FLOOR[0] is None:
        f = jax.jit(lambda s: s * 1.0 + 1.0)
        x = jnp.float32(0.0)
        float(f(x))
        ts = []
        for _ in range(20):
            s = time.perf_counter(); float(f(x)); ts.append(time.perf_counter() - s)
        _FLOOR[0] = float(np.median(ts)) * 1e3
    return _FLOOR[0]


def timed_apply(fn, *args, iters=16, reps=4):
    def chain(x0, *rest):
        def body(c, _):
            y = fn(c, *rest)
            return c + 1e-20 * jnp.sum(y.astype(c.dtype)), None
        c = jax.lax.scan(body, x0, None, length=iters)[0]
        return jnp.sum(c[..., ::61, :1].astype(jnp.float32))

    chain_jit = jax.jit(chain)
    float(chain_jit(*args))
    float(chain_jit(*args))
    ts = []
    for _ in range(reps):
        s = time.perf_counter()
        float(chain_jit(*args))
        ts.append(time.perf_counter() - s)
    raw = float(np.median(ts)) / iters * 1e3
    return max(raw - _floor_ms() / iters, 0.02 * raw)


def conv(x, w):
    kh = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), (((kh - 1) // 2, kh // 2), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


GR = [14, 16, 16, 16]


def main():
    rng = np.random.default_rng(0)
    cd = jnp.bfloat16
    B, F, T, C0 = 2, 512, 256, 32
    x = jnp.asarray(rng.standard_normal((B, F, T, C0)), cd)

    # weights for the real block: layer i maps in_i -> sum(GR[i:])
    ins = [C0] + [GR[i - 1] for i in range(1, 4)]
    outs = [sum(GR[i:]) for i in range(4)]
    ws = [jnp.asarray(rng.standard_normal((4, 3, ci, co)) * 0.05, cd)
          for ci, co in zip(ins, outs)]

    def block(x, ws):
        x_residual = 0.0
        h = x
        for i in range(4):
            if i > 0:
                c = GR[i - 1]
                h, x_residual = x_residual[..., :c], x_residual[..., c:]
            h = conv(h, ws[i])
            x_residual = x_residual + h
        return x_residual

    # chained convs, no slicing (covers the same conv shapes end-to-end)
    ws_seq = [jnp.asarray(rng.standard_normal((4, 3, ci, co)) * 0.05, cd)
              for ci, co in zip([C0, 62, 48, 32], [62, 48, 32, 16])]

    def seq_convs(x, ws_seq):
        h = x
        for w in ws_seq:
            h = conv(h, w)
        return h

    def slice_only(x, ws_seq):
        h = x
        for i, w in enumerate(ws_seq):
            h = conv(h, w)
            if i < 3:
                c = GR[i]
                a, b = h[..., :c], h[..., c:]
                h = jnp.concatenate([a, b], axis=-1)  # slice + re-join
        return h

    # torch-DenseNet-style concat form, numerically IDENTICAL to block():
    # input_i = sum over k<i of o_k's segment for layer i; final output =
    # sum over k of o_k's tail segments. Implemented with per-layer-output
    # slicing ONLY at fresh conv outputs + adds (no running residual).
    def concat_form(x, ws):
        outs_l = []  # per-layer conv outputs, channels sum(GR[i:])
        h = x
        for i in range(4):
            if i > 0:
                # x_residual after step i-1 = sum_k o_k[a_k(i-1):], so its
                # first GR[i-1] channels = sum_k o_k[a_k : a_k + GR[i-1]]
                # with a_k = sum(GR[k .. i-2]).
                acc = 0.0
                for k in range(i):
                    a_k = sum(GR[m] for m in range(k, i - 1))
                    acc = acc + outs_l[k][..., a_k : a_k + GR[i - 1]]
                h = acc
            o = conv(h, ws[i])
            outs_l.append(o)
        # final residual = sum_k o_k[tail from layer-3 boundary:]
        res = 0.0
        for k in range(4):
            a_k = sum(GR[m] for m in range(k, 3))
            res = res + outs_l[k][..., a_k:]
        return res

    # equivalence of concat_form vs block (f32, CPU-checked semantics here
    # on-device is fine)
    xf = x.astype(jnp.float32)
    wsf = [w.astype(jnp.float32) for w in ws]
    d = float(jnp.abs(block(xf, wsf) - concat_form(xf, wsf)).max())
    print(f"concat_form equivalence: max abs err {d:.2e}", flush=True)

    for tag, fn, args in (("block (real split-accumulate)", block, ws),
                          ("seq_convs (no slicing)", seq_convs, ws_seq),
                          ("slice_only (slice+rejoin)", slice_only, ws_seq),
                          ("concat_form (list-of-outputs)", concat_form, ws)):
        ms = timed_apply(lambda x, *w: fn(x, list(w)), x, *args)
        print(f"{tag:34s} {ms:8.3f} ms", flush=True)

    # Narrow-out conv layout check: 74->14 NHWC vs NCHW dimension numbers.
    xc = jnp.asarray(rng.standard_normal((B, F, T, 74)), cd)
    wc = jnp.asarray(rng.standard_normal((3, 3, 74, 14)) * 0.05, cd)
    ms = timed_apply(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")), xc, wc)
    print(f"{'conv 74->14 NHWC':34s} {ms:8.3f} ms", flush=True)
    xn = jnp.moveaxis(xc, -1, 1)
    wn = jnp.transpose(wc, (3, 2, 0, 1))
    ms = timed_apply(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW")), xn, wn)
    print(f"{'conv 74->14 NCHW':34s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
