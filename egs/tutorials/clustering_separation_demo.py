"""Tutorial: embedding-clustering separation (deep clustering / DANet path).

Counterpart of reference egs/tutorials/{deep-clustering,danet}: build ideal
binary masks from a synthetic two-tone mixture, then run the external
KMeans masking path the AttractorTester uses at inference. Run:
python clustering_separation_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
# Tiny single-shot demo: CPU avoids complex-iSTFT gaps on experimental backends.
# (sitecustomize may force-register a TPU backend, so override the jax config
# after import rather than relying on the env var.)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dnn_based_source_separation_tpu.algorithm.clustering import KMeans
from dnn_based_source_separation_tpu.ops.stft import istft, stft

sr, T = 8000, 16000
t = np.arange(T) / sr
s1 = np.sin(2 * np.pi * 440 * t).astype(np.float32)   # A4
s2 = np.sin(2 * np.pi * 1320 * t).astype(np.float32)  # E6
mix = jnp.asarray(s1 + s2)

n_fft, hop = 256, 64
spec = stft(mix, n_fft, hop)
amp, phase = jnp.abs(spec), jnp.angle(spec)

# Hand-made "embedding" per TF bin: (normalized frequency, log magnitude).
# The two tones live in disjoint frequency bands, so frequency is the
# discriminative axis; a trained DeepEmbedding model learns the real thing.
F, S = amp.shape
freq = jnp.broadcast_to(jnp.arange(F, dtype=jnp.float32)[:, None] / F, (F, S))
loud = jnp.log1p(amp) / jnp.log1p(amp).max()
emb = jnp.stack([freq, 0.2 * loud], axis=-1)  # (F, S, 2)

# Threshold weighting, as in the reference DC/DANet datasets: cluster only
# the loud TF bins (the quiet ones carry no source identity), then assign
# every bin to its nearest attractor/centroid.
strong = np.asarray(amp > 0.1 * float(amp.max())).reshape(-1)
pts = np.asarray(emb).reshape(F * S, 2)[strong]
_, centroids = KMeans(2, n_iterations=10)(jnp.asarray(pts)[None])
dist = jnp.linalg.norm(emb.reshape(F * S, 1, 2) - centroids[0][None], axis=-1)
mask = jnp.eye(2)[jnp.argmin(dist, axis=-1).reshape(F, S)]  # (F, S, 2)

for k in range(2):
    est = istft(amp * mask[..., k] * jnp.exp(1j * phase), n_fft, hop, length=T)
    corr1 = float(jnp.abs(jnp.vdot(est, jnp.asarray(s1))) / (jnp.linalg.norm(est) * np.linalg.norm(s1) + 1e-9))
    corr2 = float(jnp.abs(jnp.vdot(est, jnp.asarray(s2))) / (jnp.linalg.norm(est) * np.linalg.norm(s2) + 1e-9))
    print(f"cluster {k}: corr(A4)={corr1:.2f} corr(E6)={corr2:.2f}")
