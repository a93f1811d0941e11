"""Plücker ray embeddings for camera conditioning.

Re-derivation of ``ray_condition`` (reference
``animatediff/data/dataset_train_realestate10k.py:168-210``): per-pixel ray
origin/direction from intrinsics + c2w pose, packed as ``[o x d, d]``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def ray_condition(
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    H: int,
    W: int,
    flip_flag: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
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
    dtype = c2w.dtype
    B, V = K.shape[:2]
    j = jnp.arange(H, dtype=dtype) + 0.5  # pixel-centre rows
    i = jnp.arange(W, dtype=dtype) + 0.5  # pixel-centre cols
    jj, ii = jnp.meshgrid(j, i, indexing="ij")  # [H, W]
    ii = ii.reshape(1, 1, H * W)
    jj = jj.reshape(1, 1, H * W)
    if flip_flag is not None:
        ii_flip = (W - 1 - (ii - 0.5)) + 0.5
        flip = jnp.asarray(flip_flag).reshape(1, V, 1)
        ii = jnp.where(flip, ii_flip, ii)
    ii = jnp.broadcast_to(ii, (B, V, H * W))
    jj = jnp.broadcast_to(jj, (B, V, H * W))

    fx, fy, cx, cy = jnp.split(K, 4, axis=-1)  # each [B, V, 1]
    zs = jnp.ones_like(ii)
    xs = (ii - cx) / fx
    ys = (jj - cy) / fy
    directions = jnp.stack([xs, ys, zs], axis=-1)  # [B, V, HW, 3]
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

    rays_d = jnp.einsum("bvnk,bvjk->bvnj", directions, c2w[..., :3, :3], precision="highest")
    rays_o = jnp.broadcast_to(c2w[..., None, :3, 3], rays_d.shape)
    rays_dxo = jnp.cross(rays_o, rays_d)
    plucker = jnp.concatenate([rays_dxo, rays_d], axis=-1)
    return plucker.reshape(B, V, H, W, 6)


def plucker_embedding(K: jnp.ndarray, c2w: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Unbatched convenience: K [V,4], c2w [V,4,4] -> [V, H, W, 6]."""
    return ray_condition(K[None], c2w[None], H, W)[0]
