"""Pyramid Attention Broadcast (PAB) schedules for the sampling loop.

Attention outputs drift slowly across adjacent diffusion timesteps, so
recomputing every attention at every DDIM step wastes HBM bandwidth on a
memory-bound UNet. PAB (arXiv:2408.12588) computes each attention class
every Nth step inside a middle window of the schedule and *broadcasts*
(reuses) the cached output in between; the early steps (where the latent
changes fastest) and the final steps (which set fine detail) always run
the full network.

This is a capability the torch reference does not have. TPU-first design:
the per-step reuse decisions are STATIC numpy masks stacked into the
sampling ``lax.scan``'s xs, each attention site carries its cached output
in a ``"pab"`` Flax variable collection threaded through the scan carry,
and the site-level reuse is one ``lax.cond`` over pure closures — the
step program stays a single homogeneous XLA computation.

Opt-in (``SimplePipeline(..., pab_config=PABConfig(...))``, CLI/bench
``--pab``). Default ranges are conservative: the epipolar sync attention
— CVD's core contribution — recomputes every step unless explicitly
relaxed.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

CLASSES = ("spatial", "cross", "temporal", "epi")


@dataclasses.dataclass(frozen=True)
class PABConfig:
    """Broadcast range per attention class: compute every Nth step inside
    the [start_frac, end_frac) window, reuse otherwise. Range <= 1 means
    always recompute (PAB off for that class)."""

    spatial: int = 2
    cross: int = 3
    temporal: int = 2
    epi: int = 1  # sync-critical: recompute every step unless opted in
    start_frac: float = 0.2
    end_frac: float = 0.9

    @classmethod
    def from_string(cls, s: str) -> "PABConfig":
        """Parse 'spatial=2,cross=3,temporal=2,epi=1' (missing keys keep
        their defaults)."""
        kw = {}
        for part in filter(None, (p.strip() for p in s.split(","))):
            k, _, v = part.partition("=")
            if k not in CLASSES + ("start_frac", "end_frac"):
                raise ValueError(f"unknown PAB class {k!r} in {s!r}")
            kw[k] = float(v) if k.endswith("_frac") else int(v)
        return cls(**kw)


def reuse_masks(num_steps: int, cfg: PABConfig) -> Dict[str, np.ndarray]:
    """Per-class boolean masks [num_steps]: True = reuse the cached
    attention output at that step. Step 0 (and every window boundary)
    always computes, so a zero-initialized cache is never consumed."""
    lo = int(round(num_steps * cfg.start_frac))
    hi = int(round(num_steps * cfg.end_frac))
    masks = {}
    for name in CLASSES:
        r = int(getattr(cfg, name))
        m = np.zeros(num_steps, dtype=bool)
        if r > 1:
            for i in range(lo, min(hi, num_steps)):
                if (i - lo) % r != 0:
                    m[i] = True
        masks[name] = m
    return masks
