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

Differentiable: a custom_vjp pairs the forward (which also emits the
row log-sum-exp) with a Pallas backward kernel that recomputes the bias and
probabilities per q-tile and accumulates dk/dv across sequential grid steps
(the bias itself is geometry, stop-gradient by construction —
epi_module.py:327 `.detach()`).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bias_tile(lines_ref, coords_ref, band, alpha):
    """[Tq, N] epipolar bias evaluated in VMEM from factored geometry."""
    cfc = jnp.abs(
        jax.lax.dot_general(
            lines_ref[0].astype(jnp.float32), coords_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    return -jnp.maximum(cfc - band, 0.0) * alpha


def _kernel(q_ref, k_ref, v_ref, lines_ref, coords_ref, band_ref, alpha_ref,
            out_ref, lse_ref, *, scale: float, heads: int, precision):
    q = q_ref[0]                      # [Tq, D]
    k = k_ref[0]                      # [N, D]
    v = v_ref[0]                      # [N, D]
    b_idx = pl.program_id(0) // heads
    band = band_ref[b_idx]
    alpha = alpha_ref[b_idx]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale                         # [Tq, N]
    logits = logits + _bias_tile(lines_ref, coords_ref, band, alpha)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0] = (m + jnp.log(denom))[:, 0]
    probs = (p / denom).astype(v.dtype)
    out_ref[0] = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                lines_ref, coords_ref, band_ref, alpha_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, heads: int,
                precision):
    q = q_ref[0]                      # [Tq, D]
    k = k_ref[0]                      # [N, D]
    v = v_ref[0]                      # [N, D]
    do = do_ref[0]                    # [Tq, D]
    lse = lse_ref[0, 0]               # [Tq]
    delta = delta_ref[0, 0]           # [Tq] = rowsum(do * out)
    b_idx = pl.program_id(0) // heads
    band = band_ref[b_idx]
    alpha = alpha_ref[b_idx]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale
    logits = logits + _bias_tile(lines_ref, coords_ref, band, alpha)
    p = jnp.exp(logits - lse[:, None])            # [Tq, N] f32

    dof = do.astype(jnp.float32)
    dp = jax.lax.dot_general(
        dof, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                              # [Tq, N]
    ds = p * (dp - delta[:, None])                 # [Tq, N]

    dq_ref[0] = (jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale).astype(dq_ref.dtype)

    dk_tile = jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale                                      # [N, D]
    dv_tile = jax.lax.dot_general(
        p, dof,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                              # [N, D]

    # dk/dv blocks are revisited across the (sequential, innermost) q-tile
    # grid axis: init at the first tile, accumulate after.
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = dk_tile
        dv_ref[0] = dv_tile

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        dk_ref[0] += dk_tile
        dv_ref[0] += dv_tile


def _prep(q, k, v, norm_lines, coords, band, alpha):
    B, H, N, D = q.shape
    return (
        q.reshape(B * H, N, D),
        k.reshape(B * H, N, D),
        v.reshape(B * H, N, D),
        jax.lax.stop_gradient(norm_lines),
        coords.astype(jnp.float32),
        band.reshape(B).astype(jnp.float32),
        alpha.reshape(B).astype(jnp.float32),
    )


def _precision_for(dtype):
    # exact f32 multiplies for f32 activations (parity runs); bf16 runs keep
    # the fast single-pass MXU path
    return (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _fwd_call(q, k, v, norm_lines, coords, band, alpha, q_tile):
    B, H, N, D = q.shape
    Tq = min(q_tile, N)
    assert N % Tq == 0
    scale = 1.0 / math.sqrt(D)
    qf, kf, vf, norm_lines, coords, band2, alpha2 = _prep(
        q, k, v, norm_lines, coords, band, alpha
    )
    out, lse = pl.pallas_call(
        functools.partial(_kernel, scale=scale, heads=H,
                          precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
            # [B*H, 1, N]: TPU block shapes need the trailing dims to be
            # (8k, 128k)-divisible or whole-array; a flat [B*H, N] row layout
            # can't tile the q axis.
            jax.ShapeDtypeStruct((B * H, 1, N), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(B * H, N // Tq),
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
            out_specs=(
                pl.BlockSpec((1, Tq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tq), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * N * N * (2 * D + 3),
            bytes_accessed=B * H * N * D * 4 * 4,
            transcendentals=B * H * N * N,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, norm_lines, coords, band2, alpha2)
    return out.reshape(B, H, N, D), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _epi_flash(q, k, v, norm_lines, coords, band, alpha, q_tile):
    return _fwd_call(q, k, v, norm_lines, coords, band, alpha, q_tile)[0]


def _epi_flash_fwd(q, k, v, norm_lines, coords, band, alpha, q_tile):
    out, lse = _fwd_call(q, k, v, norm_lines, coords, band, alpha, q_tile)
    return out, (q, k, v, norm_lines, coords, band, alpha, out, lse)


def _epi_flash_bwd(q_tile, res, g):
    q, k, v, norm_lines, coords, band, alpha, out, lse = res
    B, H, N, D = q.shape
    Tq = min(q_tile, N)
    scale = 1.0 / math.sqrt(D)
    qf, kf, vf, norm_lines, coords, band2, alpha2 = _prep(
        q, k, v, norm_lines, coords, band, alpha
    )
    dof = g.reshape(B * H, N, D)
    delta = jnp.sum(
        dof.astype(jnp.float32) * out.reshape(B * H, N, D).astype(jnp.float32),
        axis=-1,
    )[:, None, :]                                  # [B*H, 1, N]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=H,
                          precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, N, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, N, D), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(B * H, N // Tq),
            in_specs=[
                pl.BlockSpec((1, Tq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tq), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tq), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tq, 3), lambda b, i: (b // H, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 3), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # band
                pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha
            ],
            out_specs=(
                pl.BlockSpec((1, Tq, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * N * N * 2 * D,
            bytes_accessed=B * H * N * D * 4 * 7,
            transcendentals=B * H * N * N,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf, dof, lse, delta, norm_lines, coords, band2, alpha2)
    shape = (B, H, N, D)
    zeros = (
        jnp.zeros_like(norm_lines), jnp.zeros_like(coords),
        jnp.zeros_like(band), jnp.zeros_like(alpha),
    )
    return (
        dq.reshape(shape).astype(q.dtype),
        dk.reshape(shape).astype(k.dtype),
        dv.reshape(shape).astype(v.dtype),
    ) + zeros


_epi_flash.defvjp(_epi_flash_fwd, _epi_flash_bwd)


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
    """Fused epipolar attention; differentiable in q/k/v (geometry inputs
    get zero cotangents — the reference detaches the mask too)."""
    return _epi_flash(q, k, v, norm_lines, coords, band, alpha, q_tile)


def flash_attention_with_bias(q, k, v, bias):
    """Generic-bias entry used by ops.attention dispatch — the epi module
    calls epi_flash_attention directly with factored geometry; a
    materialized-bias flash path is not implemented."""
    raise NotImplementedError(
        "use epi_flash_attention with factored (lines, band, alpha) inputs"
    )
