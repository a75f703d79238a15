"""Stage-split DPTNet's forward: MHA vs LSTM-FFN vs segmentation.

Round-3 verdict item 4: DPTNet is the zoo's slowest model (115 RTF, 5.3%
MFU at the recipe config) and never got a stage probe. At the recipe
config (n_basis=64, kernel 2, stride 1, K=100, 6 blocks, B=4, 4 s) the
latent stream is ~32k frames -> S~640 chunks, so per block:

  intra-chunk: (B*S=2560, L=100)  MHA + bidir-LSTM(64->256) FFN
  inter-chunk: (B*K=400,  L=640)  MHA + bidir-LSTM(64->256) FFN

Variants (probe-local copies of the blocks with pieces disabled, timed as
full separator stacks on the latent shape):

  full        — both halves of every block
  mha_only    — LSTM-FFN replaced by identity (isolates attention)
  lstm_only   — MHA replaced by identity (isolates the recurrences)
  intra_only  — inter-chunk ImprovedTransformer skipped
  inter_only  — intra-chunk ImprovedTransformer skipped
  seg_only    — all 6 blocks skipped (segment/norm/OLA/mask machinery)

Plus raw `lstm_scan_bidir` timings at the two actual shapes with the
kernel's batch/chunk tile plan, to convert block times into us/step.

Usage: python scripts/probe_dptnet.py
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


def timed_scan(fn, carry, *consts, iters=8, reps=4):
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


# ---- probe-local separator with switchable pieces -------------------------
from dnn_based_source_separation_tpu.ops.attention import MultiheadAttention
from dnn_based_source_separation_tpu.ops.norms import choose_layer_norm
from dnn_based_source_separation_tpu.ops.rnn import choose_rnn
from dnn_based_source_separation_tpu.ops.segment import overlap_add, segment
from dnn_based_source_separation_tpu.models.modules import PReLU, choose_nonlinear

EPS = 1e-12


class ProbeImprovedTransformer(nn.Module):
    num_features: int
    hidden_channels: int
    num_heads: int = 4
    use_mha: bool = True
    use_lstm: bool = True
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        if self.use_mha:
            residual = x
            h = MultiheadAttention(self.num_features, self.num_heads,
                                   name="multihead_attn")(x)
            h = h + residual
            h = choose_layer_norm("gLN", self.num_features, causal=False,
                                  eps=self.eps)(h)
        else:
            h = x
        if self.use_lstm:
            residual = h
            f = choose_rnn("lstm", self.hidden_channels, bidirectional=True,
                           parent_name="rnn")(h)
            f = choose_nonlinear("relu")(f)
            f = nn.Dense(self.num_features, name="fc")(f)
            h = f + residual
            h = choose_layer_norm("gLN", self.num_features, causal=False,
                                  eps=self.eps)(h)
        return h


class ProbeSeparator(nn.Module):
    num_features: int
    bottleneck_channels: int = 64
    hidden_channels: int = 256
    chunk_size: int = 100
    num_blocks: int = 6
    num_heads: int = 4
    n_sources: int = 2
    use_mha: bool = True
    use_lstm: bool = True
    use_intra: bool = True
    use_inter: bool = True
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        B, T, N = x.shape
        K = self.chunk_size
        P = K // 2
        h = nn.Dense(self.bottleneck_channels, name="bottleneck_conv1d")(x)
        padding = (P - (T - K) % P) % P
        pl, pr = padding // 2, padding - padding // 2
        h = jnp.pad(h, ((0, 0), (pl, pr), (0, 0)))
        h = segment(h, K, P)
        Bc, S, Kc, C = h.shape
        h = h.reshape(Bc, S * Kc, C)
        h = choose_layer_norm("gLN", C, causal=False, eps=self.eps)(h)
        h = h.reshape(Bc, S, Kc, C)
        for idx in range(self.num_blocks):
            if self.use_intra:
                hh = h.reshape(Bc * S, Kc, C)
                hh = ProbeImprovedTransformer(
                    C, self.hidden_channels, num_heads=self.num_heads,
                    use_mha=self.use_mha, use_lstm=self.use_lstm,
                    name=f"block{idx}_intra")(hh)
                h = hh.reshape(Bc, S, Kc, C)
            if self.use_inter:
                hh = jnp.swapaxes(h, 1, 2).reshape(Bc * Kc, S, C)
                hh = ProbeImprovedTransformer(
                    C, self.hidden_channels, num_heads=self.num_heads,
                    use_mha=self.use_mha, use_lstm=self.use_lstm,
                    name=f"block{idx}_inter")(hh)
                h = jnp.swapaxes(hh.reshape(Bc, Kc, S, C), 1, 2)
        h = overlap_add(h, P)
        h = h[:, pl: h.shape[1] - pr]
        h = PReLU(name="prelu")(h)
        h = nn.Dense(self.n_sources * self.num_features, name="map")(h)
        h = h.reshape(B, T, self.n_sources, self.num_features)
        h = jnp.moveaxis(h, 2, 1)
        a = nn.Dense(self.num_features, name="gtu_tanh")(h)
        b = nn.Dense(self.num_features, name="gtu_sigmoid")(h)
        return jnp.tanh(a) * nn.sigmoid(b)


def main():
    B, Tlat, N = 4, 31999, 64  # latent frames for 4 s @ 8 kHz, kernel 2 stride 1
    cd = jnp.bfloat16
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((B, Tlat, N)), cd)
    audio_sec = B * 4.0

    variants = [] if "--tail-only" in sys.argv else [
        ("full", dict()),
        ("mha_only", dict(use_lstm=False)),
        ("lstm_only", dict(use_mha=False)),
        ("intra_only", dict(use_inter=False)),
        ("inter_only", dict(use_intra=False)),
        ("seg_only", dict(use_intra=False, use_inter=False)),
    ]
    from probe_2d_family import cpu_init  # host-side init (tunnel is ~25 ms/op)

    results = {}
    for tag, kw in variants:
        sep = ProbeSeparator(num_features=N, **kw)
        v = cpu_init(sep.init, jax.random.PRNGKey(0), lat)
        v = jax.tree_util.tree_map(lambda a: a.astype(cd), v)

        def fwd(c, v, lat):
            out = sep.apply(v, lat + (1e-20 * c).astype(lat.dtype))
            return c + jnp.sum(out.astype(jnp.float32)[..., ::997, :1])

        print(f"[{tag}]...", flush=True)
        ms = timed_scan(fwd, jnp.float32(0.0), v, lat)
        try:
            f = float(jax.jit(lambda v, lat: sep.apply(v, lat)).lower(
                v, lat).compile().cost_analysis()["flops"])
        except Exception:
            f = float("nan")
        results[tag] = (ms, f)
        print(f"{tag:11s} {ms:8.2f} ms  {f/(ms/1e3)/PEAK:5.1%} MFU of "
              f"{f/1e9:6.1f} GF   RTF {audio_sec/(ms/1e3):5.0f}", flush=True)

    if results:
        full, seg = results["full"][0], results["seg_only"][0]
        print("\nsplit over segmentation baseline "
              f"({seg:.1f} ms machinery):", flush=True)
        for tag in ("mha_only", "lstm_only", "intra_only", "inter_only"):
            print(f"  {tag:11s} adds {results[tag][0] - seg:8.2f} ms "
                  f"({(results[tag][0] - seg) / max(full - seg, 1e-9):5.1%} of "
                  "block time)", flush=True)

    # Raw fused-bidir-LSTM cost at the two actual shapes (xw is (B', L, 4H);
    # tile plan mirrors _bidir_pallas_raw's halved per-stream VMEM budget).
    from dnn_based_source_separation_tpu.ops.pallas_lstm import (
        _VMEM_BLOCK_BYTES, _tile_plan, lstm_scan_bidir)
    S = (Tlat + 2 * 50 - 100) // 50 + 1  # after pad; ~how the separator segments
    for (label, Bp, L), dt in [
        (s, d) for s in (("intra", B * S, 100), ("inter", B * 100, S))
        for d in (jnp.float32, jnp.bfloat16)
    ]:
        H = 256
        four_h = 4 * H
        label = f"{label}/{jnp.dtype(dt).name}"
        b_tile, chunk = _tile_plan(L, Bp, four_h, jnp.dtype(dt).itemsize,
                                   budget=_VMEM_BLOCK_BYTES // 2)
        xw = jnp.asarray(rng.standard_normal((Bp, L, four_h)), dt)
        whh = jnp.asarray(rng.standard_normal((H, four_h)) * 0.01, dt)

        def run(c, xw, whh):
            hs_f, hs_b = lstm_scan_bidir(xw + 1e-20 * c, xw, whh, whh)
            return c + jnp.sum(hs_f[..., ::499, :1])

        ms = timed_scan(run, jnp.float32(0.0), xw, whh, iters=4)
        n_seq = (Bp + b_tile - 1) // b_tile * L
        print(f"lstm_scan_bidir[{label}] (B'={Bp}, L={L}): {ms:8.2f} ms  "
              f"tile plan b_tile={b_tile} chunk={chunk} -> {n_seq} seq steps, "
              f"{ms * 1e3 / n_seq:5.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
