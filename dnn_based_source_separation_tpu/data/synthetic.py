"""Synthetic mixtures for tests, smoke training and benchmarks.

Generates deterministic multi-speaker-like mixtures (sums of random AM/FM
sinusoids + noise) so the full train/eval stack runs without any corpus.
"""
from __future__ import annotations

import numpy as np


class SyntheticMixtureDataset:
    def __init__(
        self,
        n_items: int = 64,
        samples: int = 16000,
        n_sources: int = 2,
        sample_rate: int = 8000,
        seed: int = 0,
    ):
        self.n_items = n_items
        self.samples = samples
        self.n_sources = n_sources
        self.sample_rate = sample_rate
        self.seed = seed

    def __len__(self):
        return self.n_items

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        t = np.arange(self.samples) / self.sample_rate
        sources = []
        for _ in range(self.n_sources):
            f0 = rng.uniform(80.0, 400.0)
            n_harm = rng.integers(2, 6)
            sig = np.zeros_like(t, dtype=np.float64)
            for h in range(1, int(n_harm) + 1):
                amp = rng.uniform(0.1, 1.0) / h
                fm = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
                sig += amp * np.sin(2 * np.pi * f0 * h * fm * t + rng.uniform(0, 2 * np.pi))
            env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(0.2, 2.0) * t))
            sig = sig * env + 0.01 * rng.standard_normal(self.samples)
            sig = sig / (np.abs(sig).max() + 1e-9)
            sources.append(sig.astype(np.float32))
        sources = np.stack(sources)
        mixture = sources.sum(axis=0, keepdims=True)
        return mixture.astype(np.float32), sources
