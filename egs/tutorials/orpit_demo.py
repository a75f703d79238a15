"""Tutorial: One-and-Rest PIT over variable speaker counts.

Counterpart of reference egs/tutorials/orpit_conv-tasnet: a batch can mix
2- and 3-speaker utterances; the model always estimates the (one, rest)
pair and ORPIT recursively peels sources. Here: the criterion-level view —
padded source tensors + per-item counts replace PackedSequence.
Run: python orpit_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.criterion import ORPIT, NegSISDR

rng = np.random.default_rng(0)
B, max_src, T = 2, 3, 4000
sources = np.zeros((B, max_src, T), np.float32)
counts = np.array([2, 3], np.int32)  # item 0 has 2 speakers, item 1 has 3
for b, n in enumerate(counts):
    sources[b, :n] = 0.2 * rng.standard_normal((n, T))

# The model's (one, rest) estimate: pretend it peeled source 0 perfectly.
rest = sources.sum(axis=1) - sources[:, 0]
estimates = jnp.asarray(np.stack([sources[:, 0] + 0.01 * rng.standard_normal((B, T)),
                                  rest], axis=1), jnp.float32)

orpit = ORPIT(NegSISDR())
loss = jax.jit(lambda e, s, n: orpit(e, s, n_sources=n)[0])(
    estimates, jnp.asarray(sources), jnp.asarray(counts))
print(f"ORPIT loss over a (2,3)-speaker batch: {float(loss):.3f} "
      "(one-vs-rest, best 'one' chosen per item)")
