"""Stage-time the Conv-TasNet training step: forward vs backward vs optimizer.

Answers why the full training step runs at ~12% MFU while the inference
forward hits ~22%: is it backward-pass lowering, the optimizer update, or
accounting (backward ~2x forward FLOPs at lower achievable utilization)?

Method: three scanned on-device chains at the paper config (B=8, 4 s,
bf16 compute), floor-subtracted like every other harness:
  fwd   — forward + PIT loss only;
  grad  — value_and_grad of the same loss (no update);
  step  — full train step (grad + global-norm clip + Adam).

Usage: python scripts/probe_train_stages.py
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
    """Median ms/iter of a scanned chain fn(carry, *consts)->carry.

    `consts` MUST flow through jit arguments (not closures): closed-over
    arrays are baked into the graph as literal constants, which OOM-kills
    this environment's remote compile helper (the client then hangs with
    no error). Floor-subtracted like every other harness.
    """
    def chain(c, *a):
        def body(c, _):
            return fn(c, *a), None
        out = jax.lax.scan(body, c, None, length=iters)[0]
        # Reduce to ONE scalar inside the jit so the host can force the
        # computation with a float() VALUE FETCH. block_until_ready() is not
        # a reliable barrier on this remote backend (it returned immediately
        # and the fwd chain "measured" 0 ms); a scalar fetch is.
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


def flops_of(jitted, *args):
    try:
        return float(jitted.lower(*args).compile().cost_analysis()["flops"])
    except Exception:
        return float("nan")


def main():
    from dnn_based_source_separation_tpu.criterion import NegSISDR, PIT1d
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.train.steps import (
        make_optimizer, make_train_step,
    )

    model = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=False, n_sources=2,
    )
    criterion = PIT1d(NegSISDR(), n_sources=2)
    B, T = 8, 32000
    audio_sec = B * T / 8000
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((B, 1, T)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((B, 2, T)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mix)
    optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
    opt_state = optimizer.init(variables["params"])

    cd = jnp.bfloat16

    def loss_fn(params, mix, src):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, params)
        est = model.apply(p, mix.astype(cd))
        out = criterion(est.astype(jnp.float32), src)
        return out[0] if isinstance(out, tuple) else out

    # fwd: scalar carry for the data dependency; params/data via arguments.
    # The carry must FEED the computation (mix + 1e-20*c) or XLA hoists the
    # loop-invariant loss out of the scan and the chain measures nothing.
    def fwd_once(c, v, mix, src):
        return c + loss_fn(v, mix + 1e-20 * c, src)

    print("[stage] fwd chain...", flush=True)
    ms_fwd = timed_scan(fwd_once, jnp.float32(0.0), variables, mix, src)
    f_fwd = flops_of(jax.jit(loss_fn), variables, mix, src)
    print(f"forward+loss:      {ms_fwd:7.2f} ms  "
          f"({f_fwd / (ms_fwd / 1e3) / PEAK:5.1%} MFU of {f_fwd/1e9:.1f} GF)",
          flush=True)

    # grad: carry the params so each iteration depends on the previous.
    gfn = jax.value_and_grad(loss_fn)

    # Epsilon update (not 0.0*g, which XLA folds -> the whole grad is DCE'd):
    # numerically a no-op in f32, but forces each iteration to consume the
    # previous one's gradients.
    def grad_once(params, mix, src):
        _, g = gfn(params, mix, src)
        return jax.tree_util.tree_map(lambda p, gi: p - 1e-20 * gi, params, g)

    print("[stage] grad chain...", flush=True)
    ms_grad = timed_scan(grad_once, variables, mix, src)
    f_grad = flops_of(jax.jit(gfn), variables, mix, src)
    print(f"forward+backward:  {ms_grad:7.2f} ms  "
          f"({f_grad / (ms_grad / 1e3) / PEAK:5.1%} MFU of {f_grad/1e9:.1f} GF)",
          flush=True)

    # full step (non-donating so the scan carry types stay stable).
    step = make_train_step(model, criterion, optimizer,
                           compute_dtype=cd, donate=False)

    def step_once(carry, mix, src):
        v, o = carry
        v, o, _ = step(v, o, mix, src)
        return (v, o)

    print("[stage] step chain...", flush=True)
    ms_step = timed_scan(step_once, (variables, opt_state), mix, src)
    f_step = flops_of(step, variables, opt_state, mix, src)
    print(f"full train step:   {ms_step:7.2f} ms  "
          f"({f_step / (ms_step / 1e3) / PEAK:5.1%} MFU of {f_step/1e9:.1f} GF)",
          flush=True)

    print(f"\nsplit: backward adds {ms_grad - ms_fwd:.2f} ms over forward "
          f"({(ms_grad - ms_fwd) / ms_fwd:.1f}x the fwd time for "
          f"{(f_grad - f_fwd) / max(f_fwd, 1):.1f}x the fwd FLOPs); "
          f"optimizer+clip adds {ms_step - ms_grad:.2f} ms", flush=True)
    print(f"training RTF at B=8: {audio_sec / (ms_step / 1e3):.0f} audio-sec/s",
          flush=True)


if __name__ == "__main__":
    main()
