"""Pre-encoded latents cache: encode each training clip through the VAE
ONCE (on device, frame-chunked), then train from the stored posterior.

The reference encodes all frames inside every training iteration under
no_grad (train_epi_control.py:514-523) — at 64 frames/step that encode is
pure repeated work: the same clip re-encodes every epoch. TPU-first lever:
a one-time encode pass writes each item's posterior MOMENTS (mean, logvar)
to disk; the train step then draws a fresh posterior sample per iteration
(elementwise math, ~free) so the stochastic behavior of per-step encoding
is preserved exactly while the encoder conv stack drops out of the step.

Storage per item (16-frame pairs at 256px): moments 2x [32,h,w,4] f16
(~0.5 MB) + poses/intrinsics — the 50 MB Plücker tensor is NOT stored; it
re-derives from the cached intrinsics + c2w at read time (same
ray_condition the dataset uses).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import numpy as np


def _intrinsics_vec(K_mats: np.ndarray) -> np.ndarray:
    """[N,3,3] -> [N,4] (fx, fy, cx, cy)."""
    return np.stack(
        [K_mats[:, 0, 0], K_mats[:, 1, 1], K_mats[:, 0, 2], K_mats[:, 1, 2]],
        axis=-1,
    ).astype(np.float32)


def make_encode_fn(modules, frame_chunk: int = 8) -> Callable:
    """Jitted chunked posterior-moments encoder: [N,H,W,3] -> (mean, logvar)
    [N,H/8,W/8,4] (unscaled; VAE_SCALE applies after sampling)."""
    import jax
    import jax.numpy as jnp

    def enc(vae_params, images):
        n = images.shape[0]
        pad = (-n) % frame_chunk
        flat = images
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)])
        chunks = flat.reshape(-1, frame_chunk, *flat.shape[1:])

        def one(x):
            return modules.vae.apply(vae_params, x, method=modules.vae.encode)

        mean, logvar = jax.lax.map(one, chunks)
        mean = mean.reshape(-1, *mean.shape[2:])[:n]
        logvar = logvar.reshape(-1, *logvar.shape[2:])[:n]
        return mean, logvar

    return jax.jit(enc)


def build_latents_cache(
    dataset,
    modules,
    cache_dir: str,
    num_items: Optional[int] = None,
    frame_chunk: int = 8,
    log=print,
) -> str:
    """One-time encode pass over ``dataset`` items -> ``cache_dir``/*.npz.

    Each npz carries: latent_mean/latent_logvar (f16), text, F_mats,
    ret_c2w, ret_K_mats, intrinsics. A manifest.json records the item count
    and sample geometry so CachedLatentsDataset can validate compatibility.
    """
    import jax.numpy as jnp

    os.makedirs(cache_dir, exist_ok=True)
    n_items = len(dataset) if num_items is None else min(num_items, len(dataset))
    enc = make_encode_fn(modules, frame_chunk)
    t0 = time.time()
    meta = None
    for i in range(n_items):
        out = os.path.join(cache_dir, f"item-{i:06d}.npz")
        if os.path.exists(out):
            continue
        item = dataset[i]
        px = item["pixel_values"]  # [2n, H, W, 3] in [-1, 1]
        mean, logvar = enc(modules.vae_params, jnp.asarray(px, jnp.float32))
        np.savez(
            out,
            latent_mean=np.asarray(mean, np.float16),
            latent_logvar=np.asarray(logvar, np.float16),
            text=np.asarray(item["text"]),
            F_mats=np.asarray(item["F_mats"], np.float32),
            ret_c2w=np.asarray(item["ret_c2w"], np.float32),
            ret_K_mats=np.asarray(item["ret_K_mats"], np.float32),
            intrinsics=_intrinsics_vec(np.asarray(item["ret_K_mats"])),
        )
        if meta is None:
            meta = {"num_items": n_items, "frames": int(px.shape[0]),
                    "sample_size": int(px.shape[1]),
                    "latent_size": int(np.asarray(mean).shape[1])}
        if (i + 1) % 50 == 0 or i + 1 == n_items:
            log(f"[latents-cache] {i + 1}/{n_items} "
                f"({(time.time() - t0) / (i + 1):.2f}s/item)")
    if meta is not None:
        with open(os.path.join(cache_dir, "manifest.json"), "w") as f:
            json.dump(meta, f)
    return cache_dir


class CachedLatentsDataset:
    """Reads build_latents_cache items; emits the ``latent_mean``/
    ``latent_logvar`` batch keys the train step samples from, plus the
    Plücker embedding re-derived from the cached poses (identical to the
    source dataset's: ray_condition is per-frame, so folding commutes)."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        self.files = sorted(
            f for f in os.listdir(cache_dir)
            if f.startswith("item-") and f.endswith(".npz")
        )
        if not self.files:
            raise FileNotFoundError(f"no cached items under {cache_dir}")
        mpath = os.path.join(cache_dir, "manifest.json")
        self.meta = json.load(open(mpath)) if os.path.exists(mpath) else {}

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        from cvd_tpu.geometry import ray_condition

        z = np.load(os.path.join(self.cache_dir, self.files[idx]),
                    allow_pickle=False)
        c2w = z["ret_c2w"]
        size = self.meta.get("sample_size", int(z["latent_mean"].shape[1]) * 8)
        plucker = np.asarray(
            ray_condition(z["intrinsics"][None], c2w[None].astype(np.float32),
                          size, size)[0]
        )
        return {
            "latent_mean": z["latent_mean"].astype(np.float32),
            "latent_logvar": z["latent_logvar"].astype(np.float32),
            "text": str(z["text"]),
            "plucker_embedding": plucker,
            "F_mats": z["F_mats"],
            "ret_c2w": c2w,
            "ret_K_mats": z["ret_K_mats"],
        }
