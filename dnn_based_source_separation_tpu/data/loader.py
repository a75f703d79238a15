"""Minimal batch pipeline: map-style dataset -> shuffled fixed-size batches.

Replaces torch DataLoader (reference TrainDataLoader/EvalDataLoader,
`egs/wsj0-mix/common/src/dataset.py:625-683`). Batches are stacked numpy
arrays with STATIC shapes (drop_last=True by default for training) so every
step hits the same compiled XLA program.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: Optional[bool] = None,
        seed: int = 0,
        collate_fn=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.rng = np.random.default_rng(seed)
        self.collate_fn = collate_fn

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for i in range(0, end, self.batch_size):
            items = [self.dataset[int(j)] for j in order[i : i + self.batch_size]]
            if self.collate_fn is not None:
                yield self.collate_fn(items)
            else:
                yield tuple(np.stack(field) for field in zip(*items))
