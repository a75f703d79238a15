"""Tutorial: unsupervised separation with MixIT (mixture-invariant training).

The reference declares MixIT but leaves it unimplemented
(src/criterion/mixit.py:4-9); this framework implements it fully
(criterion/mixit.py, Wisdom et al. 2020, arXiv:2006.12701). The protocol
needs NO source references: sum two recorded mixtures into a
"mixture of mixtures", let the model output more sources than mixtures,
and score every way of routing estimated sources back to the two
mixtures — the best assignment supervises training.

Also shows Hungarian PIT (criterion/hungarian.py): exact optimal matching
past the n! feasibility wall of table PIT. Run: python mixit_unsupervised_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.criterion import (
    HungarianLoss, MixIT, NegSISDR, NegThresholdedSNR,
)
from dnn_based_source_separation_tpu.models import ConvTasNet
from dnn_based_source_separation_tpu.train import make_optimizer, make_train_step

rng = np.random.default_rng(0)
B, T = 4, 4000

# Two "recordings", each itself a 2-source mixture; we never see the sources.
s = rng.standard_normal((B, 4, T)).astype(np.float32)
mixtures = jnp.asarray(np.stack([s[:, 0] + s[:, 1], s[:, 2] + s[:, 3]], axis=1))
mixture_of_mixtures = jnp.sum(mixtures, axis=1, keepdims=True)

model = ConvTasNet(
    n_basis=64, kernel_size=16, stride=8, enc_basis="trainable",
    dec_basis="trainable", enc_nonlinear="relu",
    sep_hidden_channels=64, sep_bottleneck_channels=32, sep_skip_channels=32,
    sep_num_blocks=2, sep_num_layers=3, causal=False, n_sources=4,
)
params = model.init(jax.random.PRNGKey(0), mixture_of_mixtures)
optimizer = make_optimizer("adam", 1e-3, max_norm=5.0)
opt_state = optimizer.init(params["params"])

# The paper's thresholded-SNR loss: capped at 30 dB so already-solved
# sources stop dominating training (criterion/sdr.py:thresholded_snr).
criterion = MixIT(NegThresholdedSNR(), n_est=4, n_mix=2)

# MixIT semantics first, with oracle estimates: given the TRUE sources,
# the assignment search recovers which mixture each one came from.
_, oracle_assign = MixIT(NegSISDR(), n_est=4, n_mix=2)(
    jnp.asarray(s), mixtures)
print("oracle assignment (true sources -> mixtures):",
      np.asarray(oracle_assign)[0], "(expected [0 0 1 1])")
step = make_train_step(model, criterion, optimizer)

for i in range(500):
    params, opt_state, loss = step(
        params, opt_state, mixture_of_mixtures, mixtures)
    if i % 100 == 0 or i == 499:
        print(f"step {i:3d}: mixture-reconstruction loss {float(loss):7.2f} dB")

# Where did each estimated source go? (B, 4) mixture indices. On a tiny
# memorizable set like this the model may route all estimates to one
# mixture per item (a known MixIT local optimum); real corpora with
# unmemorizable mixture variety drive it to proper splits.
_, assignment = criterion(model.apply(params, mixture_of_mixtures), mixtures)
print("assignment (estimate -> mixture):", np.asarray(assignment)[0])

# Hungarian PIT: exact matching where the n! table is infeasible.
n = 8
src8 = jnp.asarray(rng.standard_normal((2, n, T)), jnp.float32)
est8 = src8[:, rng.permutation(n)]
loss, pattern = jax.jit(HungarianLoss(NegSISDR()))(est8, src8)
print(f"hungarian PIT at n={n}: loss {float(loss):.1f} dB, "
      f"pattern {np.asarray(pattern)[0]}")
