"""Soft epipolar attention bias — the numerical heart of CVD's sync module.

Re-derivation of ``EpiEncoding.get_attn_map`` (reference
``animatediff/models/epi_module.py:271-346``), factored TPU-first:

The reference materializes a ``[B, HW, HW]`` float bias on every epi
attention call. We factor the computation into

  1. ``lines``  — per-query epipolar line coefficients ``l_q = F @ x_q``
                  (``[B, HW, 3]``, tiny), plus
  2. ``band``   — a per-batch-row scalar derived from the *corner maximum*
                  of the point-line distance field (exact, O(HW·4) instead
                  of the reference's O(HW^2) full-matrix max), plus
  3. a cheap rank-1-ish evaluation ``bias[q, k] = -relu(d(q,k) - band) * a``

so that the Pallas fused-attention kernel can evaluate step 3 per tile
inside VMEM and the ``[B, HW, HW]`` tensor never exists in HBM. The
XLA reference path (`epipolar_attn_bias`) materializes it for parity
testing and as a fallback.

Why the corner max is exact: for a fixed query line ``l=(a,b,c)``, the
normalized distance ``|a x + b y + c| / ||(a,b)||`` is the absolute value
of an affine function of the key pixel ``(x, y)``; its maximum over the
axis-aligned grid of key pixels is attained at one of the 4 grid corners.
The band is the max over queries of those per-query corner maxima, which
equals the reference's max over the full [HW, HW] matrix.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-6


def pixel_grid_coords(feat_size: int, F_mat_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel-centre coordinates of the feature grid, rescaled to
    the resolution the F matrix is defined at.

    Matches epi_module.py:284-299: integer grid (x=col, y=row), flattened
    row-major ``(h w)``, then ``(S/f) * p + (S/f - 1)/2`` with the
    homogeneous coordinate reset to 1.
    Returns [feat_size**2, 3].
    """
    r = jnp.arange(feat_size, dtype=dtype)
    ys, xs = jnp.meshgrid(r, r, indexing="ij")  # row-major: q = y*f + x
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)
    scale = F_mat_size / feat_size
    coords = scale * coords + (scale - 1.0) / 2.0
    return coords.at[:, 2].set(1.0)


def epipolar_lines(F_mats: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """l_q = F @ x_q for every query pixel. [B,3,3] x [Q,3] -> [B,Q,3]."""
    return jnp.einsum("bij,qj->bqi", F_mats, coords, precision="highest")


def pseudo_lines(
    coords: jnp.ndarray,
    slope: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Lines through each pixel's own coordinate.

    With ``slope`` (radians, shape broadcastable to the leading batch dim):
    ``(cos s, sin s, -(cos s * x + sin s * y))``; without: horizontal lines
    ``(0, -1, y)``. Matches epi_module.py:331-346.

    Args:
      coords: [..., Q, 3] homogeneous pixel coords.
      slope:  optional [...] angles.
    Returns [..., Q, 3].
    """
    x = coords[..., 0]
    y = coords[..., 1]
    if slope is None:
        a = jnp.zeros_like(x)
        b = -jnp.ones_like(x)
        c = y
    else:
        slope = jnp.asarray(slope)
        a = jnp.broadcast_to(jnp.cos(slope)[..., None], x.shape)
        b = jnp.broadcast_to(jnp.sin(slope)[..., None], x.shape)
        c = -(a * x + b * y)
    return jnp.stack([a, b, c], axis=-1)


def homography_lines(
    H_mats: jnp.ndarray,
    coords: jnp.ndarray,
    F_mat_size: int,
    slope: jnp.ndarray,
) -> jnp.ndarray:
    """Pseudo-epipolar lines via a homography (pose-free data path).

    Matches epi_module.py:301-310: centre pixel coords, apply H,
    dehomogenise, un-centre, then draw a random-slope line through the
    mapped point.

    Args:
      H_mats: [B, 3, 3]; coords: [Q, 3]; slope: [B] radians.
    Returns [B, Q, 3].
    """
    half = (F_mat_size - 1) / 2.0
    centred = coords.at[:, :2].add(-half)
    mapped = jnp.einsum("bij,qj->bqi", H_mats, centred, precision="highest")
    mapped = mapped / (mapped[..., 2:] + _EPS)
    mapped = mapped.at[..., :2].add(half)
    return pseudo_lines(mapped, slope=slope)


def _corner_coords(feat_size: int, F_mat_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """The 4 corner pixel coords of the rescaled grid, [4, 3]."""
    scale = F_mat_size / feat_size
    lo = 0.0 * scale + (scale - 1.0) / 2.0
    hi = (feat_size - 1.0) * scale + (scale - 1.0) / 2.0
    return jnp.array(
        [[lo, lo, 1.0], [lo, hi, 1.0], [hi, lo, 1.0], [hi, hi, 1.0]], dtype=dtype
    )


def lines_and_band(
    lines: jnp.ndarray,
    feat_size: int,
    F_mat_size: int,
    pixel_band: float = 3.0,
    decay_alpha: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Precompute (normalized lines, band, alpha) for on-the-fly bias eval.

    Normalizes each line by ``||(a, b)|| + eps`` so the per-(q, k) bias is
    just ``-relu(|l'_q . x_k| - band) * alpha`` — one dot product per pair.

    Returns:
      norm_lines: [B, Q, 3] lines scaled by 1/(ab_norm + eps)
      band:       [B] adaptive band (corner-max based, exact)
      alpha:      [B] decay slope  = decay_alpha / (band + eps)
    """
    ab_norm = jnp.sqrt(jnp.sum(lines[..., :2] ** 2, axis=-1, keepdims=True))
    norm_lines = lines / (ab_norm + _EPS)
    corners = _corner_coords(feat_size, F_mat_size, lines.dtype)
    # max over keys of |l'.x| is attained at a grid corner (affine function)
    corner_vals = jnp.abs(jnp.einsum("bqi,ki->bqk", norm_lines, corners, precision="highest"))
    max_cfc = jnp.max(corner_vals, axis=(-1, -2))
    band = pixel_band / (F_mat_size // 2) * max_cfc
    alpha = decay_alpha / (band + _EPS)
    return norm_lines, band, alpha


def epipolar_attn_bias_from_lines(
    lines: jnp.ndarray,
    coords: jnp.ndarray,
    feat_size: int,
    F_mat_size: int,
    pixel_band: float = 3.0,
    decay_alpha: float = 3.0,
) -> jnp.ndarray:
    """Materialized [B, Q, K] bias from precomputed lines (XLA path)."""
    norm_lines, band, alpha = lines_and_band(
        lines, feat_size, F_mat_size, pixel_band, decay_alpha
    )
    cfc = jnp.abs(jnp.einsum("bqi,ki->bqk", norm_lines, coords, precision="highest"))
    bias = -jnp.clip(cfc - band[:, None, None], 0.0, None) * alpha[:, None, None]
    bias = jnp.nan_to_num(bias, nan=0.0, posinf=0.0, neginf=0.0)
    return jax.lax.stop_gradient(bias)


def epipolar_attn_bias(
    F_mats: Optional[jnp.ndarray],
    feat_size: int,
    F_mat_size: int = 256,
    H_mats: Optional[jnp.ndarray] = None,
    batch_size: Optional[int] = None,
    pixel_band: float = 3.0,
    decay_alpha: float = 3.0,
    first_frame_period: Optional[int] = 16,
    rand_slope_first_frame: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full reference-equivalent soft epipolar attention bias.

    Reproduces EpiEncoding.get_attn_map (epi_module.py:293-329) including:
    * F-matrix path with every ``first_frame_period``-th batch row replaced
      by pseudo lines through the pixel itself (shared random slope when
      ``rand_slope_first_frame``; horizontal lines otherwise),
    * homography path (``H_mats``): random-slope lines through H-mapped
      pixels, one slope per batch row,
    * identity path (both None): random-slope lines through each pixel.

    Args:
      F_mats: [B, 3, 3] per (video, frame) fundamental matrices or None.
      feat_size: spatial size of the (square) token grid; Q = feat_size**2.
      F_mat_size: resolution the F matrices are expressed at.
      rng: PRNG key for random slopes (required on paths that use them).
    Returns:
      [B, Q, Q] additive attention bias (<= 0), stop-gradiented.
    """
    coords = pixel_grid_coords(feat_size, F_mat_size)
    if H_mats is not None:
        B = H_mats.shape[0]
        slope = _require_slope(rng, (B,))
        lines = homography_lines(H_mats, coords, F_mat_size, slope)
    elif F_mats is not None:
        B = F_mats.shape[0]
        lines = epipolar_lines(F_mats, coords)
        if first_frame_period is not None:
            slope = (
                _require_slope(rng, (1,)) if rand_slope_first_frame else None
            )
            ff_lines = pseudo_lines(coords[None], slope=slope)  # [1, Q, 3]
            is_ff = (jnp.arange(B) % first_frame_period) == 0
            lines = jnp.where(is_ff[:, None, None], ff_lines, lines)
    else:
        if batch_size is None:
            raise ValueError("batch_size required when F_mats and H_mats are None")
        B = batch_size
        slope = _require_slope(rng, (B,))
        lines = pseudo_lines(
            jnp.broadcast_to(coords[None], (B,) + coords.shape), slope=slope
        )
    return epipolar_attn_bias_from_lines(
        lines, coords, feat_size, F_mat_size, pixel_band, decay_alpha
    )


def _require_slope(rng: Optional[jax.Array], shape) -> jnp.ndarray:
    if rng is None:
        raise ValueError("rng key required for random-slope pseudo epipolar lines")
    return jax.random.uniform(rng, shape, minval=0.0, maxval=jnp.pi)
