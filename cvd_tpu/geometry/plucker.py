"""Plücker ray embeddings for camera conditioning.

Re-derivation of ``ray_condition`` (reference
``animatediff/data/dataset_train_realestate10k.py:168-210``): per-pixel ray
origin/direction from intrinsics + c2w pose, packed as ``[o x d, d]``.

Backend-generic (geometry/_xp.py): numpy inputs -> numpy math, so dataset
worker processes never touch JAX; JAX inputs/tracers -> jnp math.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from cvd_tpu.geometry._xp import array_namespace, einsum


def ray_condition(K, c2w, H: int, W: int, flip_flag: Optional[object] = None):
    """Plücker embedding of the camera rays.

    Args:
      K:   [B, V, 4] intrinsics rows (fx, fy, cx, cy) in pixels.
      c2w: [B, V, 4, 4] camera-to-world poses.
      H, W: image size in pixels.
      flip_flag: optional [V] bools; flipped views use mirrored x coords
        (reference lines 181-190).
    Returns:
      [B, V, H, W, 6] — ``concat(o x d, d)`` with unit-norm d.
    """
    xp = array_namespace(K, c2w, flip_flag)
    dtype = c2w.dtype
    B, V = K.shape[:2]
    j = xp.arange(H, dtype=dtype) + 0.5  # pixel-centre rows
    i = xp.arange(W, dtype=dtype) + 0.5  # pixel-centre cols
    jj, ii = xp.meshgrid(j, i, indexing="ij")  # [H, W]
    ii = ii.reshape(1, 1, H * W)
    jj = jj.reshape(1, 1, H * W)
    if flip_flag is not None:
        ii_flip = (W - 1 - (ii - 0.5)) + 0.5
        flip = xp.asarray(flip_flag).reshape(1, V, 1)
        ii = xp.where(flip, ii_flip, ii)
    ii = xp.broadcast_to(ii, (B, V, H * W))
    jj = xp.broadcast_to(jj, (B, V, H * W))

    fx, fy, cx, cy = [K[..., k : k + 1] for k in range(4)]  # each [B, V, 1]
    zs = xp.ones_like(ii)
    xs = (ii - cx) / fx
    ys = (jj - cy) / fy
    directions = xp.stack([xs, ys, zs], axis=-1)  # [B, V, HW, 3]
    directions = directions / xp.linalg.norm(directions, axis=-1, keepdims=True)

    rays_d = einsum(xp, "bvnk,bvjk->bvnj", directions, c2w[..., :3, :3])
    rays_o = xp.broadcast_to(c2w[..., None, :3, 3], rays_d.shape)
    rays_dxo = xp.cross(rays_o, rays_d)
    plucker = xp.concatenate([rays_dxo, rays_d], axis=-1)
    return plucker.reshape(B, V, H, W, 6)


def plucker_embedding(K, c2w, H: int, W: int):
    """Unbatched convenience: K [V,4], c2w [V,4,4] -> [V, H, W, 6]."""
    return ray_condition(K[None], c2w[None], H, W)[0]
