"""Stage-split MMDenseNet: where does a 1.8%-MFU model spend its time?

Round-3 verdict item 3, step 2. `probe_conv2d_packing.py` showed the
ISOLATED dense-block convs run at 3.6-53% MFU (only narrow-OUTPUT convs
are catastrophic), so the model's 1.8% must include a large glue tax
(BatchNorm/ReLU boundaries, split-accumulate slicing, pool/transpose-conv
resampling, band plumbing) or be dominated by its narrow-out layers.

Stages measured at the MMDenseNet paper config (B=2, 1025 bins, 256
frames, bf16):

  full model      — MMDenseNet.apply (inference)
  band backbones  — each MDenseNetBackbone alone on its band's bins
  dense block     — the low band's first encoder DenseBlock standalone,
                    then with norm off / nonlinear off / both off
  conv sum        — the same block's convs timed individually and summed
                    (block - sum = intra-block glue)

Usage: python scripts/probe_mmdense.py
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


def timed_apply(fn, *args, iters=16, reps=4):
    """Median ms of fn(*args) amortized over a scanned chain."""
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


def flops_of(fn, *args):
    try:
        return float(jax.jit(fn).lower(*args).compile()
                     .cost_analysis()["flops"])
    except Exception:
        return float("nan")


def report(tag, ms, f):
    print(f"{tag:34s} {ms:8.2f} ms  {f/(ms/1e3)/PEAK:5.1%} MFU of "
          f"{f/1e9:7.1f} GF", flush=True)


def main():
    from dnn_based_source_separation_tpu.models.m_densenet import (
        DenseBlock, MDenseNetBackbone)
    from dnn_based_source_separation_tpu.utils.config import (
        build_mmdensenet_from_config)

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    model = build_mmdensenet_from_config(
        os.path.join(root, "egs/musdb18/mm-densenet/config/paper.yaml"))
    cd = jnp.bfloat16
    B, F, T = 2, 1025, 256
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((B, 2, F, T)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), spec)
    vb = jax.tree_util.tree_map(
        lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, v)

    def full(x, v):
        return model.apply(v, x)

    x_in = spec.astype(cd)
    ms = timed_apply(lambda x, v: full(x, v), x_in, vb)
    report("MMDenseNet full (paper, bf16)", ms, flops_of(full, x_in, vb))

    # Band backbones standalone (low: 512 bins k(4,3); high: 513 k(3,3);
    # full: 1025 k(4,3)) — channels-last (B, bins, T, C) like the model uses.
    bands = [
        ("low", 512, 32, [14, 16, 16, 16, 16, 16, 16], (4, 3), [4] * 7),
        ("high", 513, 32, [10] * 7, (3, 3), [3] * 7),
        ("fullband", 1025, 32, [6] * 7, (4, 3), [2, 2, 2, 4, 2, 2, 2]),
    ]
    total = 0.0
    for name, bins, nf, gr, ks, depth in bands:
        bb = MDenseNetBackbone(nf, gr, ks, scale=2, depth=depth,
                               out_channels=gr[-1])
        xb = jnp.asarray(rng.standard_normal((B, bins, T, 2)), cd)
        vv = jax.tree_util.tree_map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a,
            bb.init(jax.random.PRNGKey(1), xb))

        def run(x, vv, bb=bb):
            return bb.apply(vv, x)

        ms_b = timed_apply(run, xb, vv)
        total += ms_b
        report(f"backbone[{name}] ({bins} bins)", ms_b, flops_of(run, xb, vv))
    print(f"sum of backbones: {total:.2f} ms (full - sum = band glue + "
          "final block)", flush=True)

    # DenseBlock standalone: the low band's first encoder block at its real
    # shape (after the initial 32-feature conv, 512x256 grid), norm/relu
    # ablations.
    xd = jnp.asarray(rng.standard_normal((B, 512, 256, 32)), cd)
    for tag, kw in (
        ("DenseBlock g14x4 (norm+relu)", dict()),
        ("DenseBlock g14x4 (no norm)", dict(norm=False)),
        ("DenseBlock g14x4 (no relu)", dict(nonlinear=False)),
        ("DenseBlock g14x4 (bare convs)", dict(norm=False, nonlinear=False)),
    ):
        db = DenseBlock([14, 16, 16, 16], (4, 3), **kw)
        vv = jax.tree_util.tree_map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a,
            db.init(jax.random.PRNGKey(2), xd))

        def run(x, vv, db=db):
            return db.apply(vv, x)

        ms_d = timed_apply(run, xd, vv)
        report(tag, ms_d, flops_of(run, xd, vv))

    # The same block's four convs in isolation (32->62, 14->48, 16->32,
    # 16->16 at (4,3)) — summed.
    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((2, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    tot = 0.0
    for ci, co in ((32, 62), (14, 48), (16, 32), (16, 16)):
        xc = jnp.asarray(rng.standard_normal((B, 512, 256, ci)), cd)
        wc = jnp.asarray(rng.standard_normal((4, 3, ci, co)) * 0.1, cd)
        ms_c = timed_apply(conv, xc, wc)
        tot += ms_c
        print(f"  conv {ci:3d}->{co:3d}: {ms_c:6.3f} ms", flush=True)
    print(f"sum of bare convs: {tot:.2f} ms (block - sum = BN/ReLU/slice "
          "glue)", flush=True)


if __name__ == "__main__":
    main()
