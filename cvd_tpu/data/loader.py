"""Host-side data loading: prefetch workers + per-process sharding.

Replaces the reference's DataLoader(num_workers=32) + DistributedSampler
(train_epi_control.py:289-306): a worker pool maps __getitem__ while the
accelerator steps, and each JAX process takes a strided slice of the epoch
permutation (the multi-host equivalent of DistributedSampler).

Two worker types:
  * ``thread``  — a ThreadPoolExecutor. Zero-copy and simple, but mp4/png
    decode is Python/GIL-bound, so throughput tops out near one core.
  * ``process`` — forked worker processes (the reference's num_workers=32
    equivalent). Each worker inherits the dataset via fork and decodes on
    its own core; samples return pickled through the pool. Pools are
    forked at iteration start (per epoch, for the per-epoch reseed), which
    can be after the JAX backend initialized — safe ONLY because dataset
    __getitem__ math is host-only numpy (geometry/_xp.py); a dataset that
    touches JAX per item would deadlock a forked child on inherited
    runtime locks.

``scripts/loader_bench.py`` measures both against the train-step budget.
"""
from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

# fork-inherited dataset for process workers (initargs would pickle it;
# fork inheritance is free and keeps mmap'd/cached state shared). The
# global is only valid between "assign" and "fork done", so both happen
# under _FORK_LOCK: concurrently iterating loaders (hybrid training runs
# several) must not fork a pool while another loader's dataset is staged.
_FORK_DATASET = None
_FORK_LOCK = threading.Lock()


def _qput(q, item, stop) -> bool:
    """put that re-checks ``stop``: a consumer that abandoned iteration
    leaves the queue full, and a plain q.put would block the producer (and
    its worker pool) forever."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.25)
            return True
        except queue.Full:
            continue
    return False


def _process_worker_init(seed: int, counter):
    """Reseed per-worker rngs so forked workers don't replay identical
    augmentation/frame-sampling streams; worker ids come from a shared
    counter so runs are reproducible (torch worker_init_fn parity)."""
    import random

    with counter.get_lock():
        wid = counter.value
        counter.value += 1
    ds = _FORK_DATASET
    wseed = seed * 1000 + wid
    if hasattr(ds, "rng") and isinstance(getattr(ds, "rng"), random.Random):
        ds.rng.seed(wseed)
    np.random.seed(wseed % (2**32))


def _process_worker_get(i: int):
    return _FORK_DATASET[int(i)]


def shard_indices(
    n: int,
    epoch: int,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    shuffle: bool = True,
    drop_last_to_multiple: Optional[int] = None,
) -> np.ndarray:
    """Deterministic per-epoch, per-process index shard."""
    rng = np.random.default_rng(seed + epoch)
    idx = rng.permutation(n) if shuffle else np.arange(n)
    idx = idx[process_index::process_count]
    if drop_last_to_multiple:
        idx = idx[: len(idx) // drop_last_to_multiple * drop_last_to_multiple]
    return idx


def _stack_batch(samples: Sequence[dict]) -> dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = list(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Batched iterator with background prefetch over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
        collate: Callable = _stack_batch,
        worker_type: str = "thread",
    ):
        if worker_type not in ("thread", "process"):
            raise ValueError(f"worker_type {worker_type!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.collate = collate
        self.worker_type = worker_type

        self.epoch = 0

    def __len__(self) -> int:
        per_proc = len(self.dataset) // self.process_count
        return per_proc // self.batch_size

    def _fork_pool(self):
        """Fork a worker pool for this epoch. The global-stage + fork pair
        is serialized across ALL loaders (_FORK_LOCK) so a concurrent
        loader cannot overwrite the staged dataset mid-fork."""
        import multiprocessing

        global _FORK_DATASET
        ctx = multiprocessing.get_context("fork")
        counter = ctx.Value("i", 0)
        with _FORK_LOCK:
            _FORK_DATASET = self.dataset
            # workers fork (and capture the dataset) inside Pool.__init__
            pool = ctx.Pool(
                self.num_workers, initializer=_process_worker_init,
                initargs=(self.seed + self.epoch, counter),
            )
            _FORK_DATASET = None
        return pool

    def _map_batches(self, batches, q, stop, pool):
        if pool is not None:
            for b in batches:
                if stop.is_set():
                    return
                samples = pool.map(_process_worker_get, list(b))
                if not _qput(q, self.collate(samples), stop):
                    return
        else:
            with ThreadPoolExecutor(self.num_workers) as tpool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(tpool.map(self.dataset.__getitem__, b))
                    if not _qput(q, self.collate(samples), stop):
                        return

    def __iter__(self) -> Iterator[dict]:
        idx = shard_indices(
            len(self.dataset), self.epoch, self.seed,
            self.process_index, self.process_count, self.shuffle,
            drop_last_to_multiple=self.batch_size,
        )
        self.epoch += 1
        batches = idx.reshape(-1, self.batch_size)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        # fork in the consumer's thread (not the producer) so pool setup is
        # serialized with any other loader's fork via _FORK_LOCK
        pool = self._fork_pool() if self.worker_type == "process" else None

        def produce():
            try:
                self._map_batches(batches, q, stop, pool)
                _qput(q, None, stop)
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                _qput(q, e, stop)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            if pool is not None:
                # kill forked workers even if the consumer abandoned the
                # iterator mid-epoch (the producer notices `stop` at its
                # next bounded q.put and exits)
                pool.terminate()
                pool.join()
