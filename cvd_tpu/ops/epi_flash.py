"""Fused (epipolar) flash attention — Pallas TPU kernels.

Motivation (profiled on TPU v5e, 2-view 16f 256px UNet step): every
N=1024 attention in XLA materializes bf16 logits [B,H,N,N] plus an f32
softmax tensor in HBM — ~8.6 ms per attention, ~86 ms per UNet call across
the ten res-1 spatial+epi attentions. The reference does the same through
SDPA and additionally materializes the epipolar bias per call
(epi_module.py:293-329, attention_processor.py:617-619).

These kernels keep everything in VMEM:

* bias (epi path) evaluated per q-tile from the factored geometry of
  cvd_tpu.geometry.epipolar_mask.lines_and_band:
      bias[q, k] = -relu(|l'_q . x_k| - band_b) * alpha_b
  where l'_q are ab-normalized epipolar line coefficients (3 floats per
  query) and x_k the key pixel coordinates — one [Tq,3]x[3,N] matmul per
  tile, shared by all heads.
* one grid step processes ALL heads of one batch row (heads looped inside
  the kernel): amortizes per-step overhead 8x and reuses the bias tile.
* softmax is exact per q-tile (keys for one row fit VMEM whole at CVD
  sizes), no online rescaling.

Differentiable: custom_vjp pairs the forward (which also emits the row
log-sum-exp) with a backward kernel that recomputes bias+probabilities per
q-tile and accumulates dk/dv across the sequential q-tile grid axis. The
bias is geometry — stop-gradient by construction (epi_module.py:327
``.detach()``), so geometry inputs get zero cotangents.

`flash_attention` is the bias-free variant used for the UNet's big spatial
self-attentions (incl. the cross-video extended-attention kv layout).
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


def _fwd_kernel(*refs, scale, heads, has_bias, precision):
    if has_bias:
        (q_ref, k_ref, v_ref, lines_ref, coords_ref, band_ref, alpha_ref,
         out_ref, lse_ref) = refs
        b_idx = pl.program_id(0)
        bias = _bias_tile(lines_ref, coords_ref, band_ref[b_idx],
                          alpha_ref[b_idx])
    else:
        q_ref, k_ref, v_ref, out_ref, lse_ref = refs
        bias = None

    for h in range(heads):
        q = q_ref[0, h]               # [Tq, D]
        k = k_ref[0, h]               # [Lk, D]
        v = v_ref[0, h]               # [Lk, D]
        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * scale                     # [Tq, Lk] f32
        if bias is not None:
            logits = logits + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0, h, 0] = (m + jnp.log(denom))[:, 0]
        # normalize the [Tq, D] accumulator, not the [Tq, Lk] probabilities
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        out_ref[0, h] = (acc / denom).astype(out_ref.dtype)


def _bwd_kernel(*refs, scale, heads, has_bias, precision):
    if has_bias:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, lines_ref,
         coords_ref, band_ref, alpha_ref, dq_ref, dk_ref, dv_ref) = refs
        b_idx = pl.program_id(0)
        bias = _bias_tile(lines_ref, coords_ref, band_ref[b_idx],
                          alpha_ref[b_idx])
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref) = refs
        bias = None

    first_tile = pl.program_id(1) == 0
    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        lse = lse_ref[0, h, 0]
        delta = delta_ref[0, h, 0]    # rowsum(do * out)

        logits = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * scale
        if bias is not None:
            logits = logits + bias
        p = jnp.exp(logits - lse[:, None])             # [Tq, Lk] f32

        dof = do.astype(jnp.float32)
        dp = jax.lax.dot_general(
            dof, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        ds = p * (dp - delta[:, None])

        dq_ref[0, h] = (jax.lax.dot_general(
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
        ) * scale                                      # [Lk, D]
        dv_tile = jax.lax.dot_general(
            p, dof,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        # dk/dv blocks are revisited across the (sequential, innermost)
        # q-tile grid axis: init at the first tile, accumulate after.
        @pl.when(first_tile)
        def _init(h=h, dk_tile=dk_tile, dv_tile=dv_tile):
            dk_ref[0, h] = dk_tile
            dv_ref[0, h] = dv_tile

        @pl.when(jnp.logical_not(first_tile))
        def _acc(h=h, dk_tile=dk_tile, dv_tile=dv_tile):
            dk_ref[0, h] += dk_tile
            dv_ref[0, h] += dv_tile


def _precision_for(dtype):
    # exact f32 multiplies for f32 activations (parity runs); bf16 runs keep
    # the fast single-pass MXU path
    return (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _pick_tile(q_tile: int, Lq: int, Lk: int) -> int:
    Tq = min(q_tile, Lq)
    if Lk >= 2048:  # bound the [Tq, Lk] f32 logits tile
        Tq = min(Tq, 256)
    while Lq % Tq:
        Tq //= 2
    return max(Tq, 8)


def _interpret():
    # interpret mode off-TPU (CPU tests / debugging)
    return jax.default_backend() != "tpu"


def _geom_specs(B, H, Tq, Lk):
    return [
        pl.BlockSpec((1, Tq, 3), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Lk, 3), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # band [B]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha [B]
    ]


def _fwd_call(q, k, v, geom, q_tile):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Tq = _pick_tile(q_tile, Lq, Lk)
    scale = 1.0 / math.sqrt(D)
    has_bias = geom is not None

    in_specs = [
        pl.BlockSpec((1, H, Tq, D), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Lk, D), lambda b, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Lk, D), lambda b, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if has_bias:
        norm_lines, coords, band, alpha = geom
        in_specs += _geom_specs(B, H, Tq, coords.shape[0])
        args += [
            jax.lax.stop_gradient(norm_lines), coords.astype(jnp.float32),
            band.reshape(B).astype(jnp.float32),
            alpha.reshape(B).astype(jnp.float32),
        ]

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=H,
                          has_bias=has_bias, precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
            # [B, H, 1, Lq]: trailing block dims must be (8k, 128k)-divisible
            # or whole-array — a [B*H, Lq] row layout can't tile the q axis
            jax.ShapeDtypeStruct((B, H, 1, Lq), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(B, Lq // Tq),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, H, Tq, D), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, 1, Tq), lambda b, i: (b, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * (2 * D + (3 if has_bias else 0)),
            bytes_accessed=B * H * (2 * Lq + 2 * Lk) * D * 2,
            transcendentals=B * H * Lq * Lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*args)
    return out, lse


def _bwd_call(q, k, v, geom, out, lse, g, q_tile):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Tq = _pick_tile(q_tile, Lq, Lk)
    scale = 1.0 / math.sqrt(D)
    has_bias = geom is not None

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, :, None, :]                                   # [B, H, 1, Lq]

    in_specs = [
        pl.BlockSpec((1, H, Tq, D), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Lk, D), lambda b, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Lk, D), lambda b, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, Tq, D), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, 1, Tq), lambda b, i: (b, 0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, 1, Tq), lambda b, i: (b, 0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, g, lse, delta]
    if has_bias:
        norm_lines, coords, band, alpha = geom
        in_specs += _geom_specs(B, H, Tq, coords.shape[0])
        args += [
            jax.lax.stop_gradient(norm_lines), coords.astype(jnp.float32),
            band.reshape(B).astype(jnp.float32),
            alpha.reshape(B).astype(jnp.float32),
        ]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=H,
                          has_bias=has_bias, precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lq, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lk, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lk, D), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(B, Lq // Tq),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, H, Tq, D), lambda b, i: (b, 0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Lk, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Lk, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Lq * Lk * D,
            bytes_accessed=B * H * (4 * Lq + 4 * Lk) * D * 4,
            transcendentals=B * H * Lq * Lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*args)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
    )


# --------------------------------------------------------------------- #
# epipolar-bias entry point
# --------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _epi_flash(q, k, v, norm_lines, coords, band, alpha, q_tile):
    out, _ = _fwd_call(q, k, v, (norm_lines, coords, band, alpha), q_tile)
    return out


def _epi_flash_fwd(q, k, v, norm_lines, coords, band, alpha, q_tile):
    out, lse = _fwd_call(q, k, v, (norm_lines, coords, band, alpha), q_tile)
    return out, (q, k, v, norm_lines, coords, band, alpha, out, lse)


def _epi_flash_bwd(q_tile, res, g):
    q, k, v, norm_lines, coords, band, alpha, out, lse = res
    dq, dk, dv = _bwd_call(
        q, k, v, (norm_lines, coords, band, alpha), out, lse, g, q_tile
    )
    return (
        dq, dk, dv,
        jnp.zeros_like(norm_lines), jnp.zeros_like(coords),
        jnp.zeros_like(band), jnp.zeros_like(alpha),
    )


_epi_flash.defvjp(_epi_flash_fwd, _epi_flash_bwd)


def epi_flash_attention(
    q: jnp.ndarray,       # [B, H, N, D]
    k: jnp.ndarray,       # [B, H, Lk, D]
    v: jnp.ndarray,       # [B, H, Lk, D]
    norm_lines: jnp.ndarray,  # [B, N, 3] (ab-normalized epipolar lines)
    coords: jnp.ndarray,      # [Lk, 3]
    band: jnp.ndarray,        # [B]
    alpha: jnp.ndarray,       # [B]
    q_tile: int = 512,
) -> jnp.ndarray:
    """Fused epipolar attention; differentiable in q/k/v (geometry inputs
    get zero cotangents — the reference detaches the mask too)."""
    return _epi_flash(q, k, v, norm_lines, coords, band, alpha, q_tile)


# --------------------------------------------------------------------- #
# bias-free entry point (big spatial self-attentions)
# --------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, q_tile):
    out, _ = _fwd_call(q, k, v, None, q_tile)
    return out


def _flash_fwd(q, k, v, q_tile):
    out, lse = _fwd_call(q, k, v, None, q_tile)
    return out, (q, k, v, out, lse)


def _flash_bwd(q_tile, res, g):
    q, k, v, out, lse = res
    return _bwd_call(q, k, v, None, out, lse, g, q_tile)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, q_tile: int = 512) -> jnp.ndarray:
    """Plain fused attention, q/k/v [B, H, L, D]; no [L, L] HBM tensors."""
    return _flash(q, k, v, q_tile)


def flash_supported(Lq: int, Lk: int, D: int) -> bool:
    """Shapes the TPU kernel tiles profitably: big rows, 8/128-aligned."""
    return Lq >= 256 and Lq % 128 == 0 and Lk % 128 == 0 and D % 8 == 0


def flash_attention_with_bias(q, k, v, bias):
    """Generic-bias entry used by ops.attention dispatch — the epi module
    calls epi_flash_attention directly with factored geometry; a
    materialized-bias flash path is not implemented."""
    raise NotImplementedError(
        "use epi_flash_attention with factored (lines, band, alpha) inputs"
    )
