"""Misc utilities: seeding, loss curves.

Capability parity: reference `src/utils/utils.py:10-34` (set_seed,
draw_loss_curve). The gdown pretrained-download helper is replaced by the
pluggable fetcher in hub/ (no Google-Drive coupling).
"""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    """Seed python, numpy (and torch if present, for parity tests)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def draw_loss_curve(train_loss, valid_loss=None, save_path: str = "loss.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    epochs = np.arange(1, len(train_loss) + 1)
    ax.plot(epochs, train_loss, label="train")
    if valid_loss is not None:
        ax.plot(epochs, valid_loss, label="valid")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Engage JAX's persistent (on-disk) compilation cache.

    TPU train-step / full-track eval graphs take minutes to compile; the
    disk cache makes resume, re-evaluation and repeated recipe invocations
    skip that cost entirely. Setting the env var alone does not engage the
    cache on plugin backends -- the config value must be set explicitly.
    Call before the first jit dispatch (every CLI does, next to set_seed).
    """
    import os as _os

    import jax

    p = path or _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "dnntpu_xla"))
    try:
        _os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"persistent compilation cache disabled: {e}", flush=True)
