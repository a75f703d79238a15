"""UMX / GALRNet stage-timing probe (round-2 verdict #3, spectrogram half:
"same pass over UMX/GALRNet's 2% MFU").

Decomposes the two low-MFU recurrent models into measured parts on the
real chip to establish whether 2% MFU is a kernel problem or the LSTM
dependency floor (BENCHMARKS.md kernel notes: ~14 us per sequential step,
independent of formulation):

  * UMX (paper cfg, B=8, 6 s stereo): full forward; the 3-layer biLSTM
    stack alone at its exact internal shape (B, S=259, 512); the
    fc-in/fc-out dense path alone; the analytic dependency floor
    S * n_layers * ~14 us vs the measured stack time.
  * GALRNet (recipe cfg, B=4, 4 s): full forward; one GALRBlock at its
    internal shape; its locally-recurrent (biLSTM) half and globally-
    attentive (MHA) half separately.

Usage: python scripts/probe_umx_galr.py
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
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16


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
        print(f"harness per-call floor: {_FLOOR[0]:.1f} ms (subtracted as floor/iters)",
              flush=True)
    return _FLOOR[0]


def timed(apply_fn, params, x, iters=16):
    """Median ms amortized over a scanned chain of stacked inputs (see
    probe_d3net.timed for the two measurement traps this avoids), with the
    fixed per-call harness cost (~25-30 ms tunnel dispatch+fetch) subtracted
    so small blocks are not swamped by it."""
    xs = jnp.stack([x] * iters)
    many = jax.jit(lambda p, xs: jax.lax.scan(
        lambda c, xi: (c + jnp.sum(apply_fn(p, xi).astype(jnp.float32)), None),
        jnp.float32(0.0), xs)[0])
    float(many(params, xs))
    ts = []
    for _ in range(4):
        s = time.perf_counter()
        float(many(params, xs))
        ts.append(time.perf_counter() - s)
    raw = float(np.median(ts)) / iters * 1e3
    return max(raw - _floor_ms() / iters, 0.05 * raw)


def flops_of(apply_fn, params, x):
    try:
        c = jax.jit(apply_fn).lower(params, x).compile()
        return float(c.cost_analysis()["flops"])
    except Exception:
        return float("nan")


def report(name, ms, fl=None):
    mfu = f"{fl / (ms / 1e3) / PEAK:6.1%}" if fl and np.isfinite(fl) else "   -  "
    print(f"{name:<56} {ms:8.2f} ms  MFU {mfu}", flush=True)


def cast(v):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)


def probe_umx():
    from dnn_based_source_separation_tpu.models import OpenUnmix
    from dnn_based_source_separation_tpu.ops.rnn import choose_rnn

    rng = np.random.default_rng(0)
    B, F, S = 8, 2049, 259  # 6 s stereo @ 44.1k, 4096-FFT/1024-hop
    umx = OpenUnmix(in_channels=2, hidden_channels=512, num_layers=3,
                    n_bins=F, max_bin=1487)
    x = jnp.asarray(np.abs(rng.standard_normal((B, 2, F, S))), jnp.bfloat16)
    v = cast(umx.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, F, S), jnp.float32)))
    ms_full = timed(umx.apply, v, x, iters=32)
    report("UMX full (paper cfg, B=8, bf16)", ms_full, flops_of(umx.apply, v, x))

    # The 3-layer biLSTM stack alone at UMX's internal shape. UMX's LSTM is
    # hidden=512 input, hidden//2=256 per direction (reference umx.py:247).
    class Stack(nn.Module):
        @nn.compact
        def __call__(self, h):
            return choose_rnn("lstm", 256, num_layers=3, bidirectional=True,
                              parent_name="rnn")(h)

    stack = Stack()
    h = jnp.asarray(rng.standard_normal((B, S, 512)), jnp.bfloat16)
    vs = cast(stack.init(jax.random.PRNGKey(0), jnp.zeros((B, S, 512), jnp.float32)))
    ms_stack = timed(stack.apply, vs, h, iters=32)
    report("  biLSTM stack alone (3 layers, B=8 x S=259 x 512)", ms_stack)

    # Dense path alone: fc-in (C*max_bin -> 512) + fc-out chain at the same
    # token count (B*S tokens).
    class DensePath(nn.Module):
        @nn.compact
        def __call__(self, t):
            t = nn.Dense(512, use_bias=False)(t)          # fc-in
            t = nn.Dense(512, use_bias=False)(jnp.tanh(t))  # bottleneck join
            t = nn.Dense(1024, use_bias=False)(t)          # fc2
            return nn.Dense(2 * 2049, use_bias=False)(t)   # fc3 -> bins
    dp = DensePath()
    tkn = jnp.asarray(rng.standard_normal((B, S, 2 * 1487)), jnp.bfloat16)
    vd = cast(dp.init(jax.random.PRNGKey(0), jnp.zeros((B, S, 2 * 1487), jnp.float32)))
    ms_dense = timed(dp.apply, vd, tkn, iters=32)
    report("  dense path alone (fc-in/join/fc2/fc3)", ms_dense,
           flops_of(dp.apply, vd, tkn))

    # NOTE: the kernel-notes "~14 us/step" figure is a B=1028-row
    # THROUGHPUT cost at the DPRNN intra shape, not a latency floor — at
    # UMX's B=8 the fused stepper advances a step in well under 1 us
    # (measured 0.44 ms / 777 steps ~= 0.57 us/step).
    per_step_us = ms_stack * 1e3 / (S * 3)
    print(f"  => LSTM stack = {ms_stack / ms_full:.0%} of the full forward; "
          f"{per_step_us:.2f} us per sequential step at B=8", flush=True)


def probe_galr():
    from dnn_based_source_separation_tpu.models.galrnet import (
        GALRBlock, GALRNet, GloballyAttentiveBlock,
    )
    from dnn_based_source_separation_tpu.models.dprnn import IntraChunkRNN

    rng = np.random.default_rng(1)
    galr = GALRNet(
        n_basis=64, kernel_size=16, stride=8, enc_nonlinear="relu",
        sep_hidden_channels=128, sep_chunk_size=100, sep_hop_size=50,
        sep_down_chunk_size=32, sep_num_blocks=6, sep_num_heads=8,
        mask_nonlinear="relu", n_sources=2,
    )
    B, T = 4, 32000
    x = jnp.asarray(rng.standard_normal((B, 1, T)), jnp.bfloat16)
    v = cast(galr.init(jax.random.PRNGKey(0), jnp.zeros((B, 1, T), jnp.float32)))
    ms_full = timed(galr.apply, v, x, iters=32)
    report("GALRNet full (recipe, B=4, bf16)", ms_full, flops_of(galr.apply, v, x))

    # Internal dual-path shape: stride-8 encoder -> ~4000 frames; K=100,
    # hop 50 -> S ~= 80 chunks. One of 6 blocks, then its two halves.
    Bq, S_, K, N = 4, 80, 100, 64
    xb = jnp.asarray(rng.standard_normal((Bq, S_, K, N)), jnp.bfloat16)
    blk = GALRBlock(num_features=N, hidden_channels=128, chunk_size=K,
                    down_chunk_size=32, num_heads=8)
    vb = cast(blk.init(jax.random.PRNGKey(0), jnp.zeros((Bq, S_, K, N), jnp.float32)))
    report("  one GALRBlock (of 6) @ (4,80,100,64)",
           timed(blk.apply, vb, xb, iters=64))

    rec = IntraChunkRNN(num_features=N, hidden_channels=128)
    vr = cast(rec.init(jax.random.PRNGKey(0), jnp.zeros((Bq, S_, K, N), jnp.float32)))
    report("    locally-recurrent half (biLSTM K=100 steps)",
           timed(rec.apply, vr, xb, iters=64))

    att = GloballyAttentiveBlock(num_features=N, chunk_size=K,
                                 down_chunk_size=32, num_heads=8)
    va = cast(att.init(jax.random.PRNGKey(0), jnp.zeros((Bq, S_, K, N), jnp.float32)))
    report("    globally-attentive half (low-dim MHA)",
           timed(att.apply, va, xb, iters=64))

    print("  (6 blocks x ~0.39 ms ~= 2.3 ms of the full 2.7 ms: the model"
          " IS its blocks; intra-RNN ~2.4x the attention half)", flush=True)


if __name__ == "__main__":
    probe_umx()
    probe_galr()
