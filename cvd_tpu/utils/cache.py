"""Persistent XLA compilation cache (big QoL for repeated runs/tests)."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/cvd_tpu_xla") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
