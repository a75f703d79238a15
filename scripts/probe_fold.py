"""Measure the gLN affine fold (models/fold.py) on-chip (round-5 item 4a).

Paper-config non-causal Conv-TasNet, B=8 x 4 s, bf16: forward latency and
MFU for the unfolded vs folded model. The fold removes one per-element
multiply+add pass per gLN (49 norms at X8 R3) on a VPU-throughput-bound
forward, plus the same passes from the t-axis reductions' perspective.

Run on the TPU chip: python scripts/probe_fold.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from bench_models import amortized_ms, model_mfu  # noqa: E402  (scripts/ sibling)


def main():
    from dnn_based_source_separation_tpu.models import ConvTasNet
    from dnn_based_source_separation_tpu.models.fold import fold_gln_affine

    model = ConvTasNet(
        n_basis=512, kernel_size=16, stride=8, enc_basis="trainable",
        dec_basis="trainable", enc_nonlinear="relu",
        sep_hidden_channels=512, sep_bottleneck_channels=128,
        sep_skip_channels=128, sep_num_blocks=3, sep_num_layers=8,
        causal=False, n_sources=2,
    )
    B, T, sr, iters = 8, 32000, 8000, 16
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((iters, B, 1, T)), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((B, 1, T), jnp.float32))
    # randomized affines so the folded graph is not trivially identical
    variables = jax.tree_util.tree_map_with_path(
        lambda p, a: (jnp.asarray(0.5 + rng.random(a.shape, np.float32))
                      if getattr(p[-1], "key", "") == "gamma" else
                      jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
                      if getattr(p[-1], "key", "") == "beta" else a),
        variables)
    to_bf16 = lambda tree: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), tree)
    v16 = to_bf16(variables)
    rtf = lambda ms: B * (T / sr) / (ms / 1e3)

    ms0 = amortized_ms(model.apply, v16, xs)
    mfu0 = model_mfu(model.apply, v16, xs[0], ms0)
    print(f"unfolded:       {ms0:.2f} ms  RTF {rtf(ms0):.0f}  MFU {mfu0:.1%}",
          flush=True)
    y0 = model.apply(v16, xs[0])

    for mode in ("heads", "all"):
        fmodel, fvars = fold_gln_affine(model, variables, mode=mode)
        fv16 = to_bf16(fvars)
        # exactness on-chip in bf16 (folded weights vs unfolded affine)
        y1 = fmodel.apply(fv16, xs[0])
        err = float(jnp.max(jnp.abs(
            y1.astype(jnp.float32) - y0.astype(jnp.float32))))
        ms1 = amortized_ms(fmodel.apply, fv16, xs)
        mfu1 = model_mfu(fmodel.apply, fv16, xs[0], ms1)
        print(f"folded[{mode:5s}]: {ms1:.2f} ms  RTF {rtf(ms1):.0f}  "
              f"MFU {mfu1:.1%}  speedup {ms0 / ms1:.3f}x  "
              f"bf16 max|delta| {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
