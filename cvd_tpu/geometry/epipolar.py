"""Two-view epipolar geometry as pure, batch-first JAX functions.

Semantics match the reference numpy implementation in CVD
(``animatediff/data/dataset_train_realestate10k.py:28-92``) but are written
batched so an entire video pair's worth of fundamental matrices is one
einsum on device instead of a per-frame Python loop.

Conventions
-----------
* ``T`` (4x4) maps camera-1 coordinates to camera-2 coordinates:
  ``x2 = T @ x1``.
* ``c2w`` are camera-to-world matrices (RealEstate10K stores w2c in the
  text files; the loader inverts them — see cameras.py).
* All functions accept arbitrary leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp


def rigid_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a rigid [..., 4, 4] transform: [R^T, -R^T t].

    Far better f32 conditioning than a general LU inverse — TPUs run f32,
    and the downstream epipolar band is only a few pixels wide.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate(
        [Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest")[..., None]], axis=-1
    )
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def calibration_inverse(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an upper-triangular calibration matrix.

    K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]]. All reference call sites use
    this structure (skew s normally 0).
    """
    fx, s, cx = K[..., 0, 0], K[..., 0, 1], K[..., 0, 2]
    fy, cy = K[..., 1, 1], K[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], -1)
    row1 = jnp.stack([zero, 1.0 / fy, -cy / fy], -1)
    row2 = jnp.stack([zero, zero, one], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def cross_product_matrix(vec: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix so that [v]x @ w = v x w.

    Reference: dataset_train_realestate10k.py:28-39.
    """
    zero = jnp.zeros_like(vec[..., 0])
    row0 = jnp.stack([zero, -vec[..., 2], vec[..., 1]], axis=-1)
    row1 = jnp.stack([vec[..., 2], zero, -vec[..., 0]], axis=-1)
    row2 = jnp.stack([-vec[..., 1], vec[..., 0], zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def essential_from_transform(T: jnp.ndarray) -> jnp.ndarray:
    """Essential matrix from a cam1->cam2 rigid transform.

    E = R @ [t_ess]x with t_ess = -R^T t (the camera-1-frame baseline).
    Reference: dataset_train_realestate10k.py:45-50.

    Args:
      T: [..., 4, 4] (or [..., 3, 4]) transform, x2 = T x1.
    Returns:
      [..., 3, 3] essential matrix satisfying x2^T E x1 = 0.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    t_ess = -jnp.einsum("...ji,...j->...i", R, t, precision="highest")
    return jnp.einsum(
        "...ij,...jk->...ik", R, cross_product_matrix(t_ess), precision="highest"
    )


def fundamental_from_transform(
    T: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray
) -> jnp.ndarray:
    """Fundamental matrix F = K2^-T E K1^-1 for pixel coords.

    Satisfies p2^T F p1 = 0 for corresponding pixels p1 (view 1), p2 (view 2).
    Reference: dataset_train_realestate10k.py:57-64.
    """
    E = essential_from_transform(T)
    K1_inv = calibration_inverse(K1)
    K2_invT = jnp.swapaxes(calibration_inverse(K2), -1, -2)
    return jnp.einsum("...ij,...jk,...kl->...il", K2_invT, E, K1_inv, precision="highest")


def relative_transform(src_c2w: jnp.ndarray, dst_c2w: jnp.ndarray) -> jnp.ndarray:
    """Transform mapping src-camera coords to dst-camera coords.

    T = inv(dst_c2w) @ src_c2w  (matches dataset_train_realestate10k.py:451).
    """
    return jnp.einsum(
        "...ij,...jk->...ik", rigid_inverse(dst_c2w), src_c2w, precision="highest"
    )


def fundamental_between_views(
    src_c2w: jnp.ndarray,
    dst_c2w: jnp.ndarray,
    K_src: jnp.ndarray,
    K_dst: jnp.ndarray,
) -> jnp.ndarray:
    """F mapping src-view pixels to epipolar lines in the dst view, batched.

    Replaces the per-frame numpy loop of the reference advanced pipeline
    (pipeline_animation_epi_advanced.py:641-646) with one batched call.
    """
    T = relative_transform(src_c2w, dst_c2w)
    return fundamental_from_transform(T, K_src, K_dst)


def k_matrix_from_fov(fov_deg: jnp.ndarray, H: float, W: float) -> jnp.ndarray:
    """Pinhole K assuming the principal point at the image centre.

    Note: the reference (dataset_train_realestate10k.py:67-77) passes the fov
    to tan() without deg->rad conversion; we treat the argument as *radians*
    matching the reference's numeric behavior only when callers pass radians.
    Callers should pass radians; named `fov_deg` kept for traceability.
    """
    fov = jnp.asarray(fov_deg)
    fx = (W / 2.0) / jnp.tan(fov / 2.0)
    fy = (H / 2.0) / jnp.tan(fov / 2.0)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zero, zero + W / 2.0], axis=-1)
    row1 = jnp.stack([zero, fy, zero + H / 2.0], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def find_fundamental_matrix(
    src_w2c: jnp.ndarray,
    dst_w2c: jnp.ndarray,
    H: float = 256,
    W: float = 256,
    src_fov: float = 45.0,
    dst_fov: float = 45.0,
) -> jnp.ndarray:
    """F between two w2c poses with fov-derived intrinsics.

    Reference: dataset_train_realestate10k.py:79-92. Accepts [..., 3, 4]
    or [..., 4, 4] poses.
    """
    src_w2c = _to_4x4(src_w2c)
    dst_w2c = _to_4x4(dst_w2c)
    T = jnp.einsum(
        "...ij,...jk->...ik", rigid_inverse(src_w2c), dst_w2c, precision="highest"
    )
    K_src = k_matrix_from_fov(jnp.asarray(src_fov, jnp.float32), H, W)
    K_dst = k_matrix_from_fov(jnp.asarray(dst_fov, jnp.float32), H, W)
    return fundamental_from_transform(T, K_src, K_dst)


def _to_4x4(mat: jnp.ndarray) -> jnp.ndarray:
    if mat.shape[-2] == 4:
        return mat
    bottom = jnp.zeros(mat.shape[:-2] + (1, 4), mat.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([mat, bottom], axis=-2)
