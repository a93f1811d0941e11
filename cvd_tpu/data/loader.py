"""Host-side data loading: threaded prefetch + per-process sharding.

Replaces the reference's DataLoader(num_workers=32) + DistributedSampler
(train_epi_control.py:289-306): a thread pool maps __getitem__ while the
accelerator steps, and each JAX process takes a strided slice of the epoch
permutation (the multi-host equivalent of DistributedSampler).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.collate = collate
        self.epoch = 0

    def __len__(self) -> int:
        per_proc = len(self.dataset) // self.process_count
        return per_proc // self.batch_size

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

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, b))
                    q.put(self.collate(samples))
            q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
