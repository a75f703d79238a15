"""Microbench the 2-D family's small-channel convs vs packed equivalents.

Round-3 verdict item 3: MMDenseNet/MMDenseLSTM/MRX/CUNet/HRNet sit at
1-3% MFU with "small-channel lane underutilization" diagnosed by analogy
from D3Net; the untried lever is space-to-depth / band-stacking so the
13-66-channel convs fill the 128-wide lanes. This probe measures, at the
ACTUAL conv shapes of the MMDenseNet paper config (dense-block convs on
the low band's 512x256 grid), four exact-equivalent lowerings:

  conv      — nn.Conv NHWC as the models use today
  im2col    — extract 3x3 patches -> one (9*Cin -> Cout) matmul
  s2d2x2    — space-to-depth pack 2x2: conv3x3 on (F/2, T/2, 4Cin) with a
              structurally-zero (3,3,4Cin,4Cout) kernel built from W
              (4x FLOPs, 4x lane fill)
  s2dF4     — frequency-only pack p=4: conv3x3 on (F/4, T, 4Cin)
              (4x FLOPs, 4x lane fill, T untouched)

Every variant is verified bit-close against `conv` in f32 on the first
shape, then timed in bf16. us/call floor-subtracted, scanned chains.

Usage: python scripts/probe_conv2d_packing.py
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
        print(f"harness per-call floor: {_FLOOR[0]:.1f} ms", flush=True)
    return _FLOOR[0]


def timed_scan(fn, x, *consts, iters=32, reps=4):
    def chain(x, *a):
        def body(c, _):
            y = fn(c, *a)
            # keep shapes stable: fold output back into the input's shape
            return c + 1e-20 * jnp.sum(y.astype(c.dtype)), None
        c = jax.lax.scan(body, x, None, length=iters)[0]
        return jnp.sum(c[..., ::97, :1].astype(jnp.float32))

    chain_jit = jax.jit(chain)
    float(chain_jit(x, *consts))
    float(chain_jit(x, *consts))
    ts = []
    for _ in range(reps):
        s = time.perf_counter()
        float(chain_jit(x, *consts))
        ts.append(time.perf_counter() - s)
    raw = float(np.median(ts)) / iters * 1e3
    return max(raw - _floor_ms() / iters, 0.02 * raw)


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col(x, w):
    B, F, T, Ci = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dh:dh + F, dw:dw + T, :] for dh in range(3) for dw in range(3)]
    patches = jnp.concatenate(cols, axis=-1)  # (B, F, T, 9*Ci)
    return patches @ w.reshape(9 * Ci, Co)


def pack_kernel_2x2(w):
    """(3,3,Ci,Co) -> (3,3,4Ci,4Co) packed-grid kernel (phase order (a,b))."""
    Ci, Co = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * Ci, 4 * Co), w.dtype)
    for a in range(2):
        for b in range(2):
            for dh in (-1, 0, 1):
                for dw in (-1, 0, 1):
                    eh, ap = divmod(a + dh, 2)
                    ew, bp = divmod(b + dw, 2)
                    pi, po = ap * 2 + bp, a * 2 + b
                    wp[eh + 1, ew + 1, pi * Ci:(pi + 1) * Ci,
                       po * Co:(po + 1) * Co] += w[dh + 1, dw + 1]
    return jnp.asarray(wp)


def s2d2x2(x, wp):
    B, F, T, Ci = x.shape
    Co4 = wp.shape[-1]
    # pack phases in (a,b) order to match pack_kernel_2x2
    xp = x.reshape(B, F // 2, 2, T // 2, 2, Ci).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(B, F // 2, T // 2, 4 * Ci)
    yp = conv_ref(xp, wp)
    y = yp.reshape(B, F // 2, T // 2, 2, 2, Co4 // 4).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, F, T, Co4 // 4)


def pack_kernel_f4(w):
    """(3,3,Ci,Co) -> (3,3,4Ci,4Co) frequency-only p=4 packed kernel."""
    Ci, Co = w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * Ci, 4 * Co), w.dtype)
    for a in range(4):
        for dh in (-1, 0, 1):
            eh, ap = divmod(a + dh, 4)
            for dw in (-1, 0, 1):
                wp[eh + 1, dw + 1, ap * Ci:(ap + 1) * Ci,
                   a * Co:(a + 1) * Co] += w[dh + 1, dw + 1]
    return jnp.asarray(wp)


def s2df4(x, wp):
    B, F, T, Ci = x.shape
    Co4 = wp.shape[-1]
    xp = x.reshape(B, F // 4, 4, T, Ci).transpose(0, 1, 3, 2, 4)
    xp = xp.reshape(B, F // 4, T, 4 * Ci)
    yp = conv_ref(xp, wp)
    y = yp.reshape(B, F // 4, T, 4, Co4 // 4).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, F, T, Co4 // 4)


def main():
    rng = np.random.default_rng(0)

    # Dense-block conv inventory, MMDenseNet paper low band (512x256 grid,
    # growth 14/16 depth 4 -> convs 32->56, 46->42, 60->28, 74->14) plus the
    # downsampled levels and a 128-wide control.
    shapes = [
        (2, 512, 256, 32, 56),
        (2, 512, 256, 74, 14),
        (2, 256, 128, 46, 42),
        (2, 128, 64, 60, 28),
        (2, 512, 256, 128, 128),  # control: full-lane conv at the same grid
    ]

    # f32 equivalence check on the first shape.
    B, F, T, Ci, Co = shapes[0]
    x = jnp.asarray(rng.standard_normal((B, F, T, Ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1, jnp.float32)
    y0 = conv_ref(x, w)
    for tag, fn, wv in (("im2col", im2col, w),
                        ("s2d2x2", s2d2x2, pack_kernel_2x2(np.asarray(w))),
                        ("s2dF4", s2df4, pack_kernel_f4(np.asarray(w)))):
        err = float(jnp.abs(fn(x, wv) - y0).max() / jnp.abs(y0).max())
        print(f"equivalence {tag}: rel err {err:.2e}", flush=True)
        assert err < 1e-4, tag

    print(f"\n{'shape':28s} {'conv':>10s} {'im2col':>10s} {'s2d2x2':>10s} "
          f"{'s2dF4':>10s}   (ms, bf16; MFU on the UNPACKED conv FLOPs)",
          flush=True)
    for B, F, T, Ci, Co in shapes:
        x = jnp.asarray(rng.standard_normal((B, F, T, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1, jnp.bfloat16)
        flops = 2 * 9 * B * F * T * Ci * Co
        cells = []
        for tag, fn, wv in (("conv", conv_ref, w),
                            ("im2col", im2col, w),
                            ("s2d2x2", s2d2x2, pack_kernel_2x2(np.asarray(w, np.float32)).astype(jnp.bfloat16)),
                            ("s2dF4", s2df4, pack_kernel_f4(np.asarray(w, np.float32)).astype(jnp.bfloat16))):
            ms = timed_scan(fn, x, wv)
            cells.append(f"{ms:7.3f}({flops/(ms/1e3)/PEAK:4.1%})")
        print(f"({B},{F:4d},{T:4d},{Ci:3d}->{Co:3d})   " + " ".join(cells),
              flush=True)


if __name__ == "__main__":
    main()
