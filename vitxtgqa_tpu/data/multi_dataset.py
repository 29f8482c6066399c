"""Multi-dataset orchestration: proportional/equal sampling across datasets.

(reference: pythia/datasets/multi_dataset.py:19-305.)  The reference has
rank 0 choose the next dataset and broadcast the choice over NCCL
(multi_dataset.py:176-195); here the schedule is a deterministic function of
(seed, step), so every host computes the same choice with no collective at
all — the TPU-native equivalent of a broadcast.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from vitxtgqa_tpu.data.loader import DataLoader, infinite_batches


class MultiDataset:
    def __init__(
        self,
        loaders: Dict[str, DataLoader],
        proportional: bool = True,
        seed: int = 0,
    ):
        if not loaders:
            raise ValueError("MultiDataset needs at least one loader")
        self.names: List[str] = sorted(loaders)
        self.loaders = loaders
        sizes = np.array(
            [len(loaders[n].dataset) for n in self.names], dtype=np.float64
        )
        if proportional:
            self.probs = sizes / sizes.sum()
        else:
            self.probs = np.full(len(self.names), 1.0 / len(self.names))
        self.seed = seed
        self._iters: Dict[str, Iterator] = {
            n: infinite_batches(loaders[n]) for n in self.names
        }

    def dataset_for_step(self, step: int) -> str:
        """Deterministic dataset choice for a global step — identical on
        every host (replaces the reference's rank-0 broadcast)."""
        rng = np.random.default_rng(self.seed * 1_000_003 + step)
        return self.names[rng.choice(len(self.names), p=self.probs)]

    def batch_for_step(self, step: int) -> Dict[str, Any]:
        return next(self._iters[self.dataset_for_step(step)])

    def iter_from(self, step: int) -> Iterator[Dict[str, Any]]:
        """Endless batch stream whose dataset schedule starts at a global
        step — a resumed trainer passes its restored iteration so the
        choice sequence matches an uninterrupted run (the schedule is a
        pure function of (seed, step); the reference instead re-broadcasts
        fresh rank-0 choices after resume, multi_dataset.py:176-195)."""
        while True:
            yield self.batch_for_step(step)
            step += 1

    def __iter__(self):
        return self.iter_from(0)
