"""Host data loader with parallel prefetch.

Replaces torch's DataLoader + DistributedSampler (reference:
core/training/trainer.py:102-134, core/utils/distributed.py:56-63). Items are
produced item-parallel by a worker pool and stacked into numpy batches;
sharding onto the device mesh happens in the trainer. In a multi-process setup
each process loads its own shard of indices (rank-strided), mirroring
DistributedSampler.

Two worker modes:
  * threads (default): zero-copy, fine when ``__getitem__`` is dominated by
    GIL-releasing cv2/numpy kernels.
  * processes (``use_processes=True``, config ``dataloader.mp``): sidesteps
    the GIL for Python-heavy pipelines (procedural rendering, click synthesis
    — profiled GIL-bound: threads made batch builds *slower* than serial).
    Every item is seeded from (seed, salt, epoch, position) via a
    ``SeedSequence`` — deterministic under any worker scheduling, stronger
    than the reference's per-worker ``seed_worker``
    (core/utils/misc.py:154-159); the pool persists across epochs so process
    startup is paid once.

Caveats (scoped determinism):
  * The per-item seeding above applies to PROCESS workers only. Thread
    workers share the interpreter's global ``random``/``np.random`` state, so
    thread-mode augmentation streams depend on scheduling — matching the
    reference's torch-DataLoader-with-threads behavior, not improving on it.
  * In process mode the dataset is pickled into the workers once, when the
    pool is first created (first iteration): parent-side dataset mutations
    after that are invisible to workers. Mutate before iterating, or call
    ``shutdown()`` to force a re-snapshot.
  * ``salt`` decorrelates loaders sharing one seed (e.g. train vs val):
    without it, two process-mode loaders with the same seed would draw
    identical per-(epoch, position) augmentation streams.
"""

from __future__ import annotations

import random
import zlib
from collections import deque
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List

import jax
import numpy as np

# per-process worker state (populated by _process_worker_init in each worker)
_WORKER = {}


def _process_worker_init(dataset, seed: int, salt: int) -> None:
    _WORKER["dataset"] = dataset
    _WORKER["seed"] = int(seed)
    _WORKER["salt"] = int(salt)


def _process_worker_get(epoch: int, position: int, index: int):
    # per-item seeding: deterministic regardless of which worker runs the
    # task (stronger than the reference's per-worker seed_worker,
    # core/utils/misc.py:154-159, whose stream depends on task scheduling).
    # SeedSequence mixes the words collision-resistantly — no epoch/position
    # aliasing at any shard size, and distinct salts give independent streams.
    s = np.random.SeedSequence(
        [_WORKER["seed"], _WORKER["salt"], epoch, position]
    ).generate_state(1)[0]
    random.seed(int(s))
    np.random.seed(int(s))
    return _WORKER["dataset"][index]


def _stack(items: List[Dict]) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        arrays = [np.asarray(it[key]) for it in items]
        first = arrays[0].dtype
        if any(a.dtype != first for a in arrays):
            # a silent np.stack promotion (e.g. uint8 images mixed with f32)
            # would skip the trainer's integer-dtype /255 normalization for
            # part of the batch — fail loudly instead
            raise TypeError(
                f"batch key {key!r} mixes dtypes "
                f"{sorted({str(a.dtype) for a in arrays})}; per-item dtypes "
                "must agree within a batch"
            )
        out[key] = np.stack(arrays)
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
        use_processes: bool = False,
        salt: str = "",
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.use_processes = use_processes
        self.salt = zlib.crc32(salt.encode())
        self._epoch = 0
        self._pool = None
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

    def _executor(self):
        """Lazily create (and keep) the worker pool across epochs."""
        if self._pool is None:
            if self.use_processes:
                import multiprocessing as mp

                # spawn, not fork: the parent holds a live (grpc-backed) TPU
                # runtime whose locks must not be duplicated into workers
                ctx = mp.get_context("spawn")
                self._pool = ProcessPoolExecutor(
                    self.num_workers, mp_context=ctx,
                    initializer=_process_worker_init,
                    initargs=(self.dataset, self.seed, self.salt),
                )
            else:
                self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def shutdown(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):  # best-effort; shutdown() is the explicit path
        try:
            self.shutdown()
        except Exception:
            pass

    def _submit(self, pool, position: int, index: int):
        if self.use_processes:
            return pool.submit(_process_worker_get, self._epoch, position,
                               index)
        return pool.submit(self.dataset.__getitem__, index)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        total = min(len(self) * self.batch_size, len(indices))
        pool = self._executor()
        # item-level sliding window: every worker stays busy inside a batch,
        # not just across prefetched batches
        window = self.batch_size * (self.prefetch + 1) + self.num_workers
        futures: deque = deque()
        pos = 0
        while pos < total and len(futures) < window:
            futures.append(self._submit(pool, pos, indices[pos]))
            pos += 1
        batch: List[Dict] = []
        while futures:
            batch.append(futures.popleft().result())
            if pos < total:
                futures.append(self._submit(pool, pos, indices[pos]))
                pos += 1
            if len(batch) == self.batch_size:
                yield _stack(batch)
                batch = []
        if batch:  # drop_last=False tail
            yield _stack(batch)
        self._epoch += 1
