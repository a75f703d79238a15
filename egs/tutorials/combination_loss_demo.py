"""Tutorial: X-UMX combination loss over source subsets.

Counterpart of reference egs/tutorials/combination-loss: shows how the
CombinationLoss averages a base criterion over all 2^n - 2 source subsets
via a precomputed subset matrix + einsum (no Python loops under jit).
Run: python combination_loss_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.criterion import CombinationLoss, NegSISDR

rng = np.random.default_rng(0)
B, n_src, T = 2, 4, 8000
sources = jnp.asarray(rng.standard_normal((B, n_src, T)), jnp.float32)
estimates = sources + 0.1 * jnp.asarray(rng.standard_normal((B, n_src, T)), jnp.float32)

loss = CombinationLoss(NegSISDR())
value = jax.jit(lambda e, s: loss(e, s))(estimates, sources)
print(f"combination NegSISDR over all subsets: {float(value):.3f} (lower = better)")
