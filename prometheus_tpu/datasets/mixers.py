"""Dataset mixers: JointDataset (dict-merge) and ProbDataset (weighted choice).

Parity targets: ``/root/reference/prometheus/datasets/base_dataset.py:48-154``.
- ``JointDataset`` merges one item from each heterogeneous child into a
  single dict (e.g. a multi-view scene + a T2I image batch per iteration).
- ``ProbDataset`` samples one same-format child per index by weight, skipping
  to the next child on failure.
"""
from __future__ import annotations

import random

import numpy as np


class JointDataset:
    def __init__(self, datasets: list, fake_length: int = -1):
        self.datasets = datasets
        self.fake_length = fake_length

    def __len__(self) -> int:
        if self.fake_length > 0:
            return self.fake_length
        return max(len(d) for d in self.datasets)

    def __getitem__(self, idx: int) -> dict:
        out: dict = {}
        for d in self.datasets:
            item = d[idx % len(d)]
            overlap = set(item) & set(out)
            if overlap:
                raise KeyError(f"joint children overlap on keys {overlap}")
            out.update(item)
        return out


class ProbDataset:
    def __init__(self, datasets: list, probs: list[float] | None = None,
                 fake_length: int = -1):
        self.datasets = datasets
        p = np.asarray(probs if probs is not None
                       else [1.0] * len(datasets), np.float64)
        self.probs = p / p.sum()
        self.fake_length = fake_length

    def __len__(self) -> int:
        if self.fake_length > 0:
            return self.fake_length
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, idx: int):
        rng = random.Random(idx)
        order = list(np.argsort([-rng.random() * w for w in self.probs]))
        # weighted first choice, then fall through remaining children on error
        first = rng.choices(range(len(self.datasets)),
                            weights=list(self.probs))[0]
        order.remove(first)
        for child in [first] + order:
            try:
                return self.datasets[child][idx % len(self.datasets[child])]
            except Exception:
                continue
        raise RuntimeError("all ProbDataset children failed")
