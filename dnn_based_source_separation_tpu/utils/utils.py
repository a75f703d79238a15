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
