"""Tutorial: SinkPIT for many-speaker permutation matching.

Counterpart of reference egs/tutorials/sinkpit_conv-tasnet: brute-force PIT
costs n! evaluations; SinkPIT relaxes the permutation search with Sinkhorn
iterations in the log domain, staying O(n^2) per iteration — the practical
choice at n >= 5. Run: python sinkpit_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.criterion import PIT1d, NegSISDR, SinkPIT

rng = np.random.default_rng(0)
B, n_src, T = 2, 5, 4000
sources = jnp.asarray(rng.standard_normal((B, n_src, T)), jnp.float32)
perm = rng.permutation(n_src)
estimates = sources[:, perm] + 0.05 * jnp.asarray(rng.standard_normal((B, n_src, T)), jnp.float32)

pit = jax.jit(lambda e, s: PIT1d(NegSISDR(), n_sources=n_src)(e, s)[0])
sink = jax.jit(lambda e, s: SinkPIT(NegSISDR(), n_sources=n_src)(e, s)[0])
l1 = float(pit(estimates, sources)); l2 = float(sink(estimates, sources))
# SinkPIT sums over sources (reference pit.py:163-194 convention) and adds
# the Sinkhorn entropy term; divide by n for a PIT-comparable scale.
print(f"exact PIT loss {l1:.3f} vs SinkPIT/n {l2 / n_src:.3f} (permutation {perm})")
