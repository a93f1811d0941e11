"""Profiling helpers (replaces the reference's wall-clock printf telemetry
with structured traces; view with TensorBoard or xprof)."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with ETA (train_epi_control.py:663-671 fields)."""

    def __init__(self):
        self.t_last = time.time()
        self.data_s = 0.0
        self.iter_s = 0.0

    def mark_data(self):
        now = time.time()
        self.data_s = now - self.t_last
        self.t_last = now

    def mark_step(self):
        now = time.time()
        self.iter_s = now - self.t_last
        self.t_last = now

    def eta(self, steps_left: int) -> float:
        return (self.data_s + self.iter_s) * steps_left


def device_memory_stats() -> dict:
    """Per-device memory usage (the reference logs torch.cuda.max_memory)."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            }
        except Exception:
            out[str(d)] = {}
    return out
