"""D3Net stage-timing probe (round-2 verdict #3: give the 2-D conv family
the Conv-TasNet treatment).

Decomposes the paper-config D3Net forward (2.9% MFU in round 2) into
measured parts on the real chip:
  * whole model (baseline, bf16 + f32);
  * per-band backbones (low / middle / full) and the final D2 head;
  * one representative D2Block at each encoder scale;
  * structural ablations of the dense block: no-BN, no-nonlinear,
    conv-only chain at the same shapes, and a lane-aligned variant
    (channels padded to 128) to separate MXU-underutilization from
    VPU/layout overhead.

Usage: python scripts/probe_d3net.py  (writes a table to stdout)
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


def timed(apply_fn, params, x, iters=8):
    """Median ms of apply_fn(params, x) amortized over a scanned chain.

    Two traps verified the hard way: (1) the scan must consume a stacked
    (iters, ...) input — a loop-invariant body lets XLA hoist the whole
    model out of the scan (D3Net read 24 ms vs the true ~96 ms); (2) params
    must be an ARGUMENT, not a closure constant — baked-in weight literals
    blow up the remote compile helper (SIGKILL/OOM at D3Net scale).
    """
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
    return float(np.median(ts)) / iters * 1e3


def flops_of(apply_fn, params, x):
    try:
        c = jax.jit(apply_fn).lower(params, x).compile()
        return float(c.cost_analysis()["flops"])
    except Exception:
        return float("nan")


def report(name, ms, fl=None):
    mfu = f"{fl / (ms / 1e3) / PEAK:6.1%}" if fl and np.isfinite(fl) else "   -  "
    print(f"{name:<52} {ms:8.2f} ms  MFU {mfu}", flush=True)


def main():
    from dnn_based_source_separation_tpu.models.d3net import D2Block, D3NetBackbone
    from dnn_based_source_separation_tpu.utils.config import build_d3net_from_config

    # Per-call floor calibration: the tunnel costs ~25-30 ms per blocking
    # call, i.e. ~floor/iters ms adds to every amortized row. Report it so
    # rows can be read as (measured - floor/iters).
    cal = jnp.ones((8, 8, 128), jnp.float32)
    floor_ms = timed(lambda p, xi: xi * p, jnp.float32(1.0), cal[0], iters=64)
    print(f"per-iteration harness floor at iters=64: {floor_ms:.3f} ms "
          f"(per-call floor ~{floor_ms * 64:.1f} ms; small-block rows below "
          f"use iters=32 -> subtract ~{floor_ms * 64 / 32:.2f} ms)", flush=True)

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    cfg_path = os.path.join(root, "egs/musdb18/d3net/config/vocals.yaml")
    rng = np.random.default_rng(0)
    B, F, S = 2, 2049, 256

    d3 = build_d3net_from_config(cfg_path)

    def cast(v):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)

    x = jnp.asarray(np.abs(rng.standard_normal((B, 2, F, S))), jnp.bfloat16)
    v = d3.init(jax.random.PRNGKey(0), jnp.zeros((B, 2, F, S), jnp.float32))
    vb = cast(v)
    ms = timed(d3.apply, vb, x, iters=8)
    report("D3Net full (paper vocals, bf16)", ms, flops_of(d3.apply, vb, x))
    xf = x.astype(jnp.float32)
    ms32 = timed(d3.apply, v, xf, iters=8)
    report("D3Net full (paper vocals, f32)", ms32)

    # Per-band backbones at their real input shapes.
    import yaml

    cfg = yaml.safe_load(open(cfg_path))
    sections = {b: cfg[b]["sections"] for b in cfg["bands"]}
    shapes = {"low": sections.get("low", 256), "middle": sections.get("middle", 1344)}
    total = sum(shapes.values())
    for band, bins in list(shapes.items()) + [("full", total)]:
        c = cfg[band]
        n_stages = len(c["growth_rate"])
        bb = D3NetBackbone(
            num_features=c["num_features"], growth_rate=c["growth_rate"],
            kernel_size=c["kernel_size"], scale=(2, 2),
            num_d2blocks=c["num_d2blocks"],
            dilated=c.get("dilated", [True] * n_stages),
            norm=c.get("norm", [True] * n_stages),
            nonlinear=c.get("nonlinear", ["relu"] * n_stages),
            depth=c["depth"],
        )
        xb = jnp.asarray(np.abs(rng.standard_normal((B, bins, S, 2))), jnp.bfloat16)
        vv = cast(bb.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, S, 2), jnp.float32)))
        ms = timed(bb.apply, vv, xb, iters=8)
        report(f"  backbone[{band}] ({bins} bins)", ms,
               flops_of(bb.apply, vv, xb))

    # One D2Block at encoder-stage shapes (low band stage 0: 256 bins).
    low = cfg["low"]
    for stage, (bins, frames) in enumerate([(256, 256), (128, 128), (64, 64)]):
        blk = D2Block(growth_rate=low["growth_rate"][stage] if False else 16,
                      kernel_size=3, dilated=True, norm=True, nonlinear="relu",
                      depth=low["depth"][stage])
        xb = jnp.asarray(np.abs(rng.standard_normal((B, bins, frames, 32))), jnp.bfloat16)
        vv = cast(blk.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, 32), jnp.float32)))
        ms = timed(blk.apply, vv, xb, iters=32)
        report(f"  D2Block g16 d{low['depth'][stage]} @{bins}x{frames}x32", ms,
               flops_of(blk.apply, vv, xb))

    # Ablations on a representative D2Block (g16 depth5 @256x256x32).
    import flax.linen as nn

    class ConvChain(nn.Module):
        """Same conv shapes as the dense block (layer i: growth-channel input
        -> sum(growth[i:]) output, dilation 2^i), but a plain feed-forward
        chain: no BN, no ReLU, no channel split/accumulate."""
        depth: int = 5
        growth: int = 16

        @nn.compact
        def __call__(self, x):
            gr = [self.growth] * self.depth
            for i in range(self.depth):
                d = 2 ** i
                y = nn.Conv(sum(gr[i:]), (3, 3), kernel_dilation=(d, d),
                            padding="SAME", name=f"c{i}")(x)
                x = y[..., : self.growth]  # next layer reads growth channels
            return y

    bins = frames = 256
    xb = jnp.asarray(np.abs(rng.standard_normal((B, bins, frames, 32))), jnp.bfloat16)

    blk_nobn = D2Block(growth_rate=16, kernel_size=3, dilated=True, norm=False,
                       nonlinear="relu", depth=5)
    vv = cast(blk_nobn.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, 32), jnp.float32)))
    report("  ablation: no-BN D2Block", timed(blk_nobn.apply, vv, xb, iters=32))

    blk_nonl = D2Block(growth_rate=16, kernel_size=3, dilated=True, norm=False,
                       nonlinear=False, depth=5)
    vv = cast(blk_nonl.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, 32), jnp.float32)))
    report("  ablation: conv+split only (no BN/ReLU)",
           timed(blk_nonl.apply, vv, xb, iters=32))

    chain = ConvChain()
    vv = cast(chain.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, 32), jnp.float32)))
    report("  ablation: bare conv chain (same shapes)",
           timed(chain.apply, vv, xb, iters=32),
           flops_of(chain.apply, vv, xb))

    # Lane-aligned comparison: one 3x3 conv at C=32->66 (paper-ish) vs 128->128
    for cin, cout in ((32, 66), (128, 128)):
        conv = nn.Conv(cout, (3, 3), padding="SAME")
        xc = jnp.asarray(rng.standard_normal((B, bins, frames, cin)), jnp.bfloat16)
        vv = cast(conv.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, cin), jnp.float32)))
        ms = timed(conv.apply, vv, xc, iters=32)
        report(f"  single 3x3 conv {cin}->{cout} @256x256", ms,
               flops_of(conv.apply, vv, xc))


if __name__ == "__main__":
    import sys as _sys
    if "--dilation-only" not in _sys.argv:
        main()


def probe_dilation():
    """Isolate the dilation cost: same D2Block with/without dilation, plus a
    shift-matmul formulation of the dilated 3x3 conv (9 static spatial
    shifts, each a (Cin,Cout) matmul accumulated) that bypasses any
    space-to-batch conv rewrite."""
    import flax.linen as nn

    from dnn_based_source_separation_tpu.models.d3net import D2Block

    rng = np.random.default_rng(0)
    B, bins, frames, C = 2, 256, 256, 32

    def cast(v):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)

    xb = jnp.asarray(np.abs(rng.standard_normal((B, bins, frames, C))), jnp.bfloat16)
    for dil in (False, True):
        blk = D2Block(growth_rate=16, kernel_size=3, dilated=dil, norm=True,
                      nonlinear="relu", depth=5)
        vv = cast(blk.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, C), jnp.float32)))
        report(f"  D2Block g16 d5 dilated={dil}", timed(blk.apply, vv, xb, iters=32))

    class ShiftMatmulConv(nn.Module):
        """3x3 conv at dilation d as 9 shifted (Cin,Cout) matmuls."""
        out_channels: int
        dilation: int = 8

        @nn.compact
        def __call__(self, x):
            B, H, W, C = x.shape
            d = self.dilation
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, C, self.out_channels))
            xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
            out = 0.0
            for i in range(3):
                for j in range(3):
                    tap = jax.lax.dynamic_slice(
                        xp, (0, i * d, j * d, 0), (B, H, W, C))
                    out = out + jnp.einsum(
                        "bhwc,co->bhwo", tap, w[i, j],
                        preferred_element_type=jnp.float32).astype(x.dtype)
            return out

    for d in (1, 8, 16):
        conv = nn.Conv(64, (3, 3), kernel_dilation=(d, d), padding="SAME")
        vv = cast(conv.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, C), jnp.float32)))
        report(f"  XLA conv 32->64 dil={d}", timed(conv.apply, vv, xb, iters=32))
        sm = ShiftMatmulConv(64, dilation=d)
        vv = cast(sm.init(jax.random.PRNGKey(0), jnp.zeros((B, bins, frames, C), jnp.float32)))
        report(f"  shift-matmul conv 32->64 dil={d}", timed(sm.apply, vv, xb, iters=32))


if __name__ == "__main__":
    probe_dilation()
