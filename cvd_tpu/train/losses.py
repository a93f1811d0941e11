"""Training losses.

* masked_mse_loss — the epsilon-prediction loss with warped-region masks
  (train_epi_control.py:605).
* epi_distance_loss — RE-DERIVED. The reference imports it from
  ``tools/consistency_losses.py`` which is absent from the release
  ("still under construction", README.md:7); only the call site survives:
  ``loss += 0.002 * epi_distance_loss(auxiliary, F_mats)`` where
  ``auxiliary = cat([conv_q(last_epi_query), conv_k(last_epi_key)], C)``
  (train_epi_control.py:607, unet.py:1429-1443). We implement the natural
  reading: soft-argmax correspondences from the auxiliary query/key maps
  must land on the epipolar lines induced by F.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cvd_tpu.geometry.epipolar_mask import epipolar_lines, pixel_grid_coords


def masked_mse_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """mean((pred*mask - target*mask)^2); mask broadcastable or None."""
    if mask is None:
        return jnp.mean((pred - target) ** 2)
    return jnp.mean((pred * mask - target * mask) ** 2)


def epi_distance_loss(
    auxiliary: jnp.ndarray,  # [B, F, h, w, 2*C] — query channels then key
    F_mats: jnp.ndarray,  # [B*F, 3, 3] (or [B, F, 3, 3])
    F_mat_size: int = 256,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Soft-correspondence-to-epipolar-line distance (re-derivation).

    For each query pixel q (own view), attention over the partner view's key
    map gives an expected match location p(q) = sum_k softmax(Q_q.K_k) x_k;
    the loss is the normalized point-to-line distance of p(q) from q's
    epipolar line l_q = F x_q, averaged. Distances are expressed in the
    F-matrix pixel frame and normalized by the image size so the weight
    0.002 (train_epi_control.py:608) is resolution-independent.
    """
    B, F, h, w, C2 = auxiliary.shape
    assert h == w, "epi loss assumes square feature grids"
    C = C2 // 2
    q_map = auxiliary[..., :C].reshape(B * F, h * w, C)
    k_map = auxiliary[..., C:].reshape(B * F, h * w, C)
    F_mats = F_mats.reshape(B * F, 3, 3)

    coords = pixel_grid_coords(h, F_mat_size)  # [hw, 3]
    logits = jnp.einsum("bqc,bkc->bqk", q_map, k_map) / (
        temperature * jnp.sqrt(jnp.asarray(C, q_map.dtype))
    )
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expected = jnp.einsum("bqk,kj->bqj", attn, coords[:, :2])  # [BF, hw, 2]
    expected_h = jnp.concatenate(
        [expected, jnp.ones(expected.shape[:-1] + (1,), expected.dtype)], -1
    )

    lines = epipolar_lines(F_mats.astype(jnp.float32), coords)  # [BF, hw, 3]
    ab_norm = jnp.sqrt(jnp.sum(lines[..., :2] ** 2, axis=-1)) + 1e-6
    dist = jnp.abs(jnp.einsum("bqi,bqi->bq", lines, expected_h)) / ab_norm
    return jnp.mean(dist) / F_mat_size
