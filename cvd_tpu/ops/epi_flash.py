"""Fused epipolar attention — Pallas TPU kernel.

The reference materializes a ``[B, HW, HW]`` float32 epipolar bias in HBM for
EVERY epi attention call (epi_module.py:293-329 + SDPA at
attention_processor.py:617-619) — at 256px that is 40 x 256MB of HBM traffic
per denoise step. This kernel evaluates the bias inside VMEM from the
factored form (cvd_tpu.geometry.epipolar_mask.lines_and_band):

    bias[q, k] = -relu(|l'_q . x_k| - band_b) * alpha_b

where l'_q are the ab-normalized epipolar line coefficients (3 floats per
query) and x_k the key pixel coordinates (3 floats per key) — one tiny
[Tq,3]x[3,N] matmul per tile instead of an HBM-resident [N, N] tensor.

Layout: q/k/v [B, H, N, D]; per-(video,frame) geometry broadcast over heads.
Grid: (B*H, N/Tq); keys/values for one (b, h) fit VMEM whole at CVD sizes
(N <= 4096, D <= 160), so softmax is exact per q-tile, no online rescaling.
Forward-only (inference); training uses the XLA path (bias is
stop-gradient'd there anyway, so only q/k/v grads differ — wired later via
custom_vjp).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, lines_ref, coords_ref, band_ref, alpha_ref,
            out_ref, *, scale: float, heads: int, precision):
    q = q_ref[0]                      # [Tq, D]
    k = k_ref[0]                      # [N, D]
    v = v_ref[0]                      # [N, D]
    lines = lines_ref[0]              # [Tq, 3]
    coords = coords_ref[:]            # [N, 3]
    b_idx = pl.program_id(0) // heads
    band = band_ref[b_idx]
    alpha = alpha_ref[b_idx]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale                         # [Tq, N]

    cfc = jnp.abs(
        jax.lax.dot_general(
            lines.astype(jnp.float32), coords,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )                                 # [Tq, N]
    bias = -jnp.maximum(cfc - band, 0.0) * alpha
    logits = logits + bias

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / denom).astype(v.dtype)
    out_ref[0] = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile",))
def epi_flash_attention(
    q: jnp.ndarray,       # [B, H, N, D]
    k: jnp.ndarray,       # [B, H, N, D]
    v: jnp.ndarray,       # [B, H, N, D]
    norm_lines: jnp.ndarray,  # [B, N, 3] (ab-normalized epipolar lines)
    coords: jnp.ndarray,      # [N, 3]
    band: jnp.ndarray,        # [B]
    alpha: jnp.ndarray,       # [B]
    q_tile: int = 512,
) -> jnp.ndarray:
    B, H, N, D = q.shape
    Tq = min(q_tile, N)
    assert N % Tq == 0
    scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)
    band2 = band.reshape(B).astype(jnp.float32)
    alpha2 = alpha.reshape(B).astype(jnp.float32)
    coords = coords.astype(jnp.float32)
    norm_lines = jax.lax.stop_gradient(norm_lines)

    grid = (B * H, N // Tq)
    # interpret mode off-TPU (CPU tests / debugging)
    interpret = jax.default_backend() != "tpu"
    # exact f32 multiplies for f32 activations (parity runs); bf16 runs keep
    # the fast single-pass MXU path
    precision = (
        jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=H, precision=precision),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Tq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tq, 3), lambda b, i: (b // H, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 3), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # band [B]
                pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha [B]
            ],
            out_specs=pl.BlockSpec((1, Tq, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * N * N * (2 * D + 3),
            bytes_accessed=B * H * N * D * 4 * 4,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(qf, kf, vf, norm_lines, coords, band2, alpha2)
    return out.reshape(B, H, N, D)


def flash_attention_with_bias(q, k, v, bias):
    """Generic-bias entry used by ops.attention dispatch — the epi module
    calls epi_flash_attention directly with factored geometry; a
    materialized-bias flash path is not implemented."""
    raise NotImplementedError(
        "use epi_flash_attention with factored (lines, band, alpha) inputs"
    )
