"""Index samplers.

FixedLengthSampler (reference: data/samplers.py:59-79): per epoch, a random
1/zero_poke_amount fraction of the indices is replaced by -1 — datasets
interpret the -1 index as "sample a zero-poke example" (the zero-poke signal
travels THROUGH the index; we preserve that contract)."""
from __future__ import annotations

import numpy as np


class FixedLengthSampler:
    def __init__(self, n_examples: int, zero_poke: bool, zero_poke_amount: int = 12, seed: int = 0):
        self.n = n_examples
        self.zero_poke = zero_poke
        self.zero_poke_amount = zero_poke_amount
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __iter__(self):
        idx = self.rng.permutation(self.n)
        if self.zero_poke and self.zero_poke_amount:
            n_zero = max(self.n // self.zero_poke_amount, 1)
            zero_positions = self.rng.choice(self.n, n_zero, replace=False)
            idx = idx.copy()
            idx[zero_positions] = -1
        return iter(idx.tolist())


class SequentialSampler:
    def __init__(self, n_examples: int):
        self.n = n_examples

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter(range(self.n))


class WeightedRandomSampler:
    """Object-weighted sampling (reference datamodule obj_weighting path)."""

    def __init__(self, weights: np.ndarray, n_samples: int, seed: int = 0):
        self.p = np.asarray(weights, np.float64)
        self.p = self.p / self.p.sum()
        self.n = n_samples
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter(self.rng.choice(len(self.p), self.n, p=self.p).tolist())
