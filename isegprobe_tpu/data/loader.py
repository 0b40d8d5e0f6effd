"""Host data loader with threaded prefetch.

Replaces torch's DataLoader + DistributedSampler (reference:
core/training/trainer.py:102-134, core/utils/distributed.py:56-63): items are
produced by a thread pool (dataset __getitem__ is cv2/numpy-bound and releases
the GIL in the hot paths) and stacked into numpy batches; sharding onto the
device mesh happens in the trainer. In a multi-process setup each process
loads its own shard of indices (rank-strided), mirroring DistributedSampler.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import jax
import numpy as np


def _stack(items: List[Dict]) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        out[key] = np.stack([np.asarray(it[key]) for it in items])
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        rank: int = None,
        world: int = None,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self._epoch = 0
        # process identity is overridable so multi-host sharding semantics are
        # unit-testable without a multi-process launch (SURVEY.md §4)
        self.rank = jax.process_index() if rank is None else rank
        self.world = max(1, jax.process_count() if world is None else world)

    def __len__(self) -> int:
        # rank-strided sharding across processes
        n = len(self.dataset) // self.world
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _indices(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            # all ranks shuffle with the same (seed, epoch) key and take
            # disjoint strides — the DistributedSampler contract
            random.Random(self.seed + self._epoch).shuffle(idx)
        return idx[self.rank::self.world]

    def _build(self, chunk: List[int]) -> Dict[str, np.ndarray]:
        return _stack([self.dataset[i] for i in chunk])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from collections import deque

        indices = self._indices()
        n_batches = len(self)
        with ThreadPoolExecutor(self.num_workers) as pool:
            queue: deque = deque()
            b = 0
            while b < n_batches or queue:
                # keep a bounded window of batches building in parallel
                while b < n_batches and len(queue) < self.prefetch + self.num_workers:
                    chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
                    queue.append(pool.submit(self._build, chunk))
                    b += 1
                yield queue.popleft().result()
        self._epoch += 1
