"""Backward-pass attack sweep for the Conv-TasNet paper-config train step.

Round-3 verdict item 2: the measured fwd-vs-step gap (21.6% vs 13.4% MFU)
names the backward pass — transposed-conv + gLN/PReLU gradient chains at
roughly half the forward's utilization — as the largest unexploited lever.
This probe measures each lever at the paper config (B=8, 4 s, bf16):

  - base        : current code (gLN custom_vjp fused backward, no remat)
  - gln_autodiff: gLN custom_vjp DISABLED (autodiff mean/var/rsqrt chain)
                  -> isolates the custom_vjp's contribution
  - remat=dots  : per-residual-block jax.checkpoint, matmul outputs saved
  - remat=block : per-residual-block jax.checkpoint, save nothing

MFU is reported against the BASE step's FLOPs for every variant (remat
recompute inflates cost_analysis FLOPs; time per useful step is the honest
metric). Timing method identical to probe_train_stages.py: scanned
on-device chains, scalar value fetch, floor-subtracted.

Usage: python scripts/probe_backward.py
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
        print(f"harness per-call floor: {_FLOOR[0]:.1f} ms", flush=True)
    return _FLOOR[0]


def timed_scan(fn, carry, *consts, iters=16, reps=4):
    """Median ms/iter of a scanned chain (see probe_train_stages.py)."""
    def chain(c, *a):
        def body(c, _):
            return fn(c, *a), None
        out = jax.lax.scan(body, c, None, length=iters)[0]
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    chain_jit = jax.jit(chain)
    float(chain_jit(carry, *consts))
    float(chain_jit(carry, *consts))
    ts = []
    for _ in range(reps):
        s = time.perf_counter()
        float(chain_jit(carry, *consts))
        ts.append(time.perf_counter() - s)
    raw = float(np.median(ts)) / iters * 1e3
    return max(raw - _floor_ms() / iters, 0.05 * raw)


def main():
    from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.ops import norms as norms_mod
    from dnn_based_source_separation_tpu.train.steps import (
        make_optimizer, make_train_step,
    )

    def build(sep_remat):
        return ConvTasNet(
            n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
            dec_basis="trainable", enc_nonlinear="relu",
            sep_hidden_channels=512, sep_bottleneck_channels=128,
            sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
            causal=False, n_sources=2, sep_remat=sep_remat,
        )

    criterion = PIT1d(NegSISDR(), n_sources=2)
    B, T = 8, 32000
    audio_sec = B * T / 8000
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((B, 1, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)

    base_model = build("none")
    variables = base_model.init(jax.random.PRNGKey(0), mix)
    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    opt_state = optimizer.init(variables["params"])
    cd = jnp.bfloat16

    # Base-step FLOPs: the honest denominator for every variant.
    base_step = make_train_step(base_model, criterion, optimizer,
                                compute_dtype=cd, donate=False)
    try:
        f_step = float(jax.jit(base_step).lower(
            variables, opt_state, mix, src).compile().cost_analysis()["flops"])
    except Exception:
        f_step = float("nan")
    print(f"base step FLOPs: {f_step/1e9:.1f} GF "
          f"(all MFU below uses this denominator)", flush=True)

    # A plain (autodiff) gLN for the custom_vjp ablation.
    def gln_plain(x, gamma, beta, eps=1e-8):
        mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(-2, -1), keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + eps) + beta

    results = {}

    def measure(tag, model, patch_gln=False):
        saved = norms_mod.global_layer_norm
        if patch_gln:
            norms_mod.global_layer_norm = gln_plain
        try:
            step = make_train_step(model, criterion, optimizer,
                                   compute_dtype=cd, donate=False)

            def step_once(carry, mix, src):
                v, o = carry
                v, o, _ = step(v, o, mix, src)
                return (v, o)

            print(f"[{tag}] step chain...", flush=True)
            ms = timed_scan(step_once, (variables, opt_state), mix, src)
        finally:
            norms_mod.global_layer_norm = saved
        mfu = f_step / (ms / 1e3) / PEAK
        rtf = audio_sec / (ms / 1e3)
        results[tag] = (ms, mfu, rtf)
        print(f"{tag:14s} {ms:7.2f} ms/step  {mfu:5.1%} MFU  "
              f"{rtf:6.0f} audio-sec/s", flush=True)
        return ms

    measure("base", base_model)
    measure("gln_autodiff", base_model, patch_gln=True)
    measure("remat_dots", build("dots"))
    measure("remat_block", build("block"))

    print("\nsummary (paper config, B=8, bf16, base-step FLOP denominator):",
          flush=True)
    for tag, (ms, mfu, rtf) in sorted(results.items(), key=lambda kv: kv[1][0]):
        print(f"  {tag:14s} {ms:7.2f} ms  {mfu:5.1%} MFU  {rtf:6.0f} audio-s/s",
              flush=True)


if __name__ == "__main__":
    main()
