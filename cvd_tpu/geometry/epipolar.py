"""Two-view epipolar geometry as pure, batch-first array functions.

Semantics match the reference numpy implementation in CVD
(``animatediff/data/dataset_train_realestate10k.py:28-92``) but are written
batched so an entire video pair's worth of fundamental matrices is one
einsum on device instead of a per-frame Python loop.

Backend-generic (geometry/_xp.py): numpy inputs compute in numpy (dataset
workers must not touch JAX), JAX arrays/tracers compute in jnp.

Conventions
-----------
* ``T`` (4x4) maps camera-1 coordinates to camera-2 coordinates:
  ``x2 = T @ x1``.
* ``c2w`` are camera-to-world matrices (RealEstate10K stores w2c in the
  text files; the loader inverts them — see cameras.py).
* All functions accept arbitrary leading batch dims.
"""
from __future__ import annotations

import numpy as np

from cvd_tpu.geometry._xp import array_namespace, einsum


def rigid_inverse(T) -> "np.ndarray":
    """Analytic inverse of a rigid [..., 4, 4] transform: [R^T, -R^T t].

    Far better f32 conditioning than a general LU inverse — TPUs run f32,
    and the downstream epipolar band is only a few pixels wide.
    """
    xp = array_namespace(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = xp.swapaxes(R, -1, -2)
    top = xp.concatenate(
        [Rt, -einsum(xp, "...ij,...j->...i", Rt, t)[..., None]], axis=-1
    )
    bottom = xp.broadcast_to(
        xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype),
        T.shape[:-2] + (1, 4),
    )
    return xp.concatenate([top, bottom], axis=-2)


def calibration_inverse(K) -> "np.ndarray":
    """Closed-form inverse of an upper-triangular calibration matrix.

    K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]]. All reference call sites use
    this structure (skew s normally 0).
    """
    xp = array_namespace(K)
    fx, s, cx = K[..., 0, 0], K[..., 0, 1], K[..., 0, 2]
    fy, cy = K[..., 1, 1], K[..., 1, 2]
    zero = xp.zeros_like(fx)
    one = xp.ones_like(fx)
    row0 = xp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], -1)
    row1 = xp.stack([zero, 1.0 / fy, -cy / fy], -1)
    row2 = xp.stack([zero, zero, one], -1)
    return xp.stack([row0, row1, row2], axis=-2)


def cross_product_matrix(vec) -> "np.ndarray":
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix so that [v]x @ w = v x w.

    Reference: dataset_train_realestate10k.py:28-39.
    """
    xp = array_namespace(vec)
    zero = xp.zeros_like(vec[..., 0])
    row0 = xp.stack([zero, -vec[..., 2], vec[..., 1]], axis=-1)
    row1 = xp.stack([vec[..., 2], zero, -vec[..., 0]], axis=-1)
    row2 = xp.stack([-vec[..., 1], vec[..., 0], zero], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def essential_from_transform(T) -> "np.ndarray":
    """Essential matrix from a cam1->cam2 rigid transform.

    E = R @ [t_ess]x with t_ess = -R^T t (the camera-1-frame baseline).
    Reference: dataset_train_realestate10k.py:45-50.

    Args:
      T: [..., 4, 4] (or [..., 3, 4]) transform, x2 = T x1.
    Returns:
      [..., 3, 3] essential matrix satisfying x2^T E x1 = 0.
    """
    xp = array_namespace(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    t_ess = -einsum(xp, "...ji,...j->...i", R, t)
    return einsum(xp, "...ij,...jk->...ik", R, cross_product_matrix(t_ess))


def fundamental_from_transform(T, K1, K2) -> "np.ndarray":
    """Fundamental matrix F = K2^-T E K1^-1 for pixel coords.

    Satisfies p2^T F p1 = 0 for corresponding pixels p1 (view 1), p2 (view 2).
    Reference: dataset_train_realestate10k.py:57-64.
    """
    xp = array_namespace(T, K1, K2)
    E = essential_from_transform(T)
    K1_inv = calibration_inverse(K1)
    K2_invT = xp.swapaxes(calibration_inverse(K2), -1, -2)
    return einsum(xp, "...ij,...jk,...kl->...il", K2_invT, E, K1_inv)


def relative_transform(src_c2w, dst_c2w) -> "np.ndarray":
    """Transform mapping src-camera coords to dst-camera coords.

    T = inv(dst_c2w) @ src_c2w  (matches dataset_train_realestate10k.py:451).
    """
    xp = array_namespace(src_c2w, dst_c2w)
    return einsum(xp, "...ij,...jk->...ik", rigid_inverse(dst_c2w), src_c2w)


def fundamental_between_views(src_c2w, dst_c2w, K_src, K_dst) -> "np.ndarray":
    """F mapping src-view pixels to epipolar lines in the dst view, batched.

    Replaces the per-frame numpy loop of the reference advanced pipeline
    (pipeline_animation_epi_advanced.py:641-646) with one batched call.
    """
    T = relative_transform(src_c2w, dst_c2w)
    return fundamental_from_transform(T, K_src, K_dst)


def k_matrix_from_fov(fov_deg, H: float, W: float) -> "np.ndarray":
    """Pinhole K assuming the principal point at the image centre.

    Note: the reference (dataset_train_realestate10k.py:67-77) passes the fov
    to tan() without deg->rad conversion; we treat the argument as *radians*
    matching the reference's numeric behavior only when callers pass radians.
    Callers should pass radians; named `fov_deg` kept for traceability.
    """
    xp = array_namespace(fov_deg)
    fov = xp.asarray(fov_deg)
    fx = (W / 2.0) / xp.tan(fov / 2.0)
    fy = (H / 2.0) / xp.tan(fov / 2.0)
    zero = xp.zeros_like(fx)
    one = xp.ones_like(fx)
    row0 = xp.stack([fx, zero, zero + W / 2.0], axis=-1)
    row1 = xp.stack([zero, fy, zero + H / 2.0], axis=-1)
    row2 = xp.stack([zero, zero, one], axis=-1)
    return xp.stack([row0, row1, row2], axis=-2)


def find_fundamental_matrix(
    src_w2c,
    dst_w2c,
    H: float = 256,
    W: float = 256,
    src_fov: float = 45.0,
    dst_fov: float = 45.0,
) -> "np.ndarray":
    """F between two w2c poses with fov-derived intrinsics.

    Reference: dataset_train_realestate10k.py:79-92. Accepts [..., 3, 4]
    or [..., 4, 4] poses.
    """
    xp = array_namespace(src_w2c, dst_w2c)
    src_w2c = _to_4x4(src_w2c)
    dst_w2c = _to_4x4(dst_w2c)
    T = einsum(xp, "...ij,...jk->...ik", rigid_inverse(src_w2c), dst_w2c)
    fov_dtype = np.float32 if xp is np else None
    K_src = k_matrix_from_fov(xp.asarray(src_fov, dtype=fov_dtype), H, W)
    K_dst = k_matrix_from_fov(xp.asarray(dst_fov, dtype=fov_dtype), H, W)
    return fundamental_from_transform(T, K_src, K_dst)


def _to_4x4(mat):
    if mat.shape[-2] == 4:
        return mat
    xp = array_namespace(mat)
    if xp is np:
        bottom = np.zeros(mat.shape[:-2] + (1, 4), mat.dtype)
        bottom[..., 0, 3] = 1.0
    else:
        bottom = xp.zeros(mat.shape[:-2] + (1, 4), mat.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
    return xp.concatenate([mat, bottom], axis=-2)
