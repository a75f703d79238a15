"""Phase reconstruction demo: Griffin-Lim, fast Griffin-Lim, MISI."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".."))
import numpy as np
# Tiny eager demo: CPU avoids complex-elementwise gaps on experimental
# TPU backends (library callers run these ops under jit, where they work).
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from dnn_based_source_separation_tpu.algorithm import fast_griffin_lim, griffin_lim, misi
from dnn_based_source_separation_tpu.ops import build_window, stft


def main():
    sr, T, n_fft, hop = 8000, 16000, 256, 64
    t = np.arange(T) / sr
    x = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    w = build_window(n_fft, "hann")
    amp = jnp.abs(stft(jnp.asarray(x), n_fft, hop, window=w))

    for name, fn in [("griffin-lim", griffin_lim), ("fast griffin-lim", fast_griffin_lim)]:
        y = np.asarray(fn(amp, n_fft, hop, window=w, iteration=60, length=T))
        amp_y = np.abs(np.asarray(stft(jnp.asarray(y), n_fft, hop, window=w)))
        rel = np.linalg.norm(amp_y - np.asarray(amp)) / np.linalg.norm(np.asarray(amp))
        print(f"{name}: consistency error {rel:.4f}")

    # MISI: joint phases for two sources from the mixture.
    s2 = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    mix = x + s2
    amps = jnp.abs(stft(jnp.asarray(np.stack([x, s2])), n_fft, hop, window=w))
    est = np.asarray(misi(amps, jnp.asarray(mix), n_fft, hop, window=w, iteration=20))
    err = np.linalg.norm(est.sum(0) - mix) / np.linalg.norm(mix)
    print(f"misi: mixture-consistency error {err:.4f}")


if __name__ == "__main__":
    main()
