"""Fused (epipolar) flash attention — Pallas TPU kernels.

Motivation (profiled on TPU v5e, 2-view 16f 256px UNet step): every
N=1024 attention in XLA materializes bf16 logits [B,H,N,N] plus an f32
softmax tensor in HBM — ~4 ms per attention across the res-1 spatial+epi
attentions. The reference does the same through SDPA and additionally
materializes the epipolar bias per call (epi_module.py:293-329,
attention_processor.py:617-619).

Design (v2 — layout-native, routed):

* q/k/v/out are [B, N, C] with C = heads*head_dim — the NATIVE layout of
  the qkv projections. The head split happens inside the kernel via static
  lane slices; the [B,N,H,D]->[B,H,N,D] transposes that XLA had to emit
  around the v1 custom call (~22 ms/UNet-step of pure copies) disappear.
* cross-video partner routing is a BlockSpec index_map over a scalar-
  prefetched kv row index (kv_index[b] = partner row of query row b), so
  the kernel reads the partner's k/v straight from HBM. This replaces the
  reference's chunk(2)-swap/gather (attention_processor.py:575-583), which
  as an XLA concatenate cost a full [B,N,C] HBM round trip per attention.
* the epipolar bias is evaluated per q-tile ON THE VPU from the factored
  geometry of cvd_tpu.geometry.epipolar_mask.lines_and_band:
      bias[q, k] = -relu(|a_q*x_k + b_q*y_k + c_q| - band_b) * alpha_b
  as broadcast arithmetic ([Tq,1]x[1,N]), NOT as a [Tq,3]x[3,N] matmul —
  a K=3 contraction pads to K=128 on the MXU and costs ~40% of a full
  QK^T pass for 2% of its FLOPs.
* one grid step processes ALL heads of one batch row (heads looped inside
  the kernel): amortizes per-step overhead 8x and reuses the bias tile.
* softmax is exact per q-tile (keys for one row fit VMEM whole at CVD
  sizes), no online rescaling.

Differentiable: custom_vjp pairs the forward (which also emits the row
log-sum-exp) with a backward kernel that recomputes bias+probabilities per
q-tile and accumulates dk/dv across the sequential q-tile grid axis. With
routing, dk/dv come out aligned to the QUERY row (the gathered layout) and
are scattered back to source rows with one XLA scatter-add (exact inverse
permutation for the 2-view swap). The bias is geometry — stop-gradient by
construction (epi_module.py:327 ``.detach()``), so geometry inputs get
zero cotangents.

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
    """[Tq, N] epipolar bias from per-query lines and per-key pixel coords.

    Pure VPU broadcast math: lines_ref block is [1, Tq, 3] (a,b,c per
    query, ab-normalized), coords_ref is [2, N] (x row, y row).
    """
    a = lines_ref[0, :, 0:1].astype(jnp.float32)   # [Tq, 1]
    b = lines_ref[0, :, 1:2].astype(jnp.float32)   # [Tq, 1]
    c = lines_ref[0, :, 2:3].astype(jnp.float32)   # [Tq, 1]
    xk = coords_ref[0:1, :]                        # [1, N]
    yk = coords_ref[1:2, :]                        # [1, N]
    cfc = jnp.abs(a * xk + b * yk + c)             # [Tq, N]
    return -jnp.maximum(cfc - band, 0.0) * alpha


def _heads(q_ref, h, D):
    return q_ref[0, :, h * D:(h + 1) * D]


def _fwd_kernel(*refs, scale, heads, has_bias, precision):
    if has_bias:
        (idx_ref, q_ref, k_ref, v_ref, lines_ref, coords_ref, band_ref,
         alpha_ref, out_ref, lse_ref) = refs
        b_idx = pl.program_id(0)
        bias = _bias_tile(lines_ref, coords_ref, band_ref[b_idx],
                          alpha_ref[b_idx])
    else:
        idx_ref, q_ref, k_ref, v_ref, out_ref, lse_ref = refs
        bias = None

    D = q_ref.shape[-1] // heads
    for h in range(heads):
        q = _heads(q_ref, h, D)       # [Tq, D]
        k = _heads(k_ref, h, D)       # [Lk, D]
        v = _heads(v_ref, h, D)       # [Lk, D]
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
        lse_ref[0, h] = (m + jnp.log(denom))[:, 0]
        # normalize the [Tq, D] accumulator, not the [Tq, Lk] probabilities
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        out_ref[0, :, h * D:(h + 1) * D] = (acc / denom).astype(out_ref.dtype)


def _bwd_kernel(*refs, scale, heads, has_bias, precision):
    if has_bias:
        (idx_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, lines_ref,
         coords_ref, band_ref, alpha_ref, dq_ref, dk_ref, dv_ref) = refs
        b_idx = pl.program_id(0)
        bias = _bias_tile(lines_ref, coords_ref, band_ref[b_idx],
                          alpha_ref[b_idx])
    else:
        (idx_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref) = refs
        bias = None

    first_tile = pl.program_id(1) == 0
    D = q_ref.shape[-1] // heads
    for h in range(heads):
        q = _heads(q_ref, h, D)
        k = _heads(k_ref, h, D)
        v = _heads(v_ref, h, D)
        do = _heads(do_ref, h, D)
        lse = lse_ref[0, h]
        delta = delta_ref[0, h]       # rowsum(do * out)

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

        dq_ref[0, :, h * D:(h + 1) * D] = (jax.lax.dot_general(
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
            dk_ref[0, :, h * D:(h + 1) * D] = dk_tile
            dv_ref[0, :, h * D:(h + 1) * D] = dv_tile

        @pl.when(jnp.logical_not(first_tile))
        def _acc(h=h, dk_tile=dk_tile, dv_tile=dv_tile):
            dk_ref[0, :, h * D:(h + 1) * D] += dk_tile
            dv_ref[0, :, h * D:(h + 1) * D] += dv_tile


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


def _identity_index(B: int):
    return jnp.arange(B, dtype=jnp.int32)


def _grid_spec(B, Lq, Lk, C, Tq, has_bias, n_out_lse_heads):
    """PrefetchScalarGridSpec: arg0 is the kv routing index [B] int32."""
    q_spec = pl.BlockSpec((1, Tq, C), lambda b, i, idx: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Lk, C), lambda b, i, idx: (idx[b], 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, Tq, 3), lambda b, i, idx: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Lk), lambda b, i, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # band [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alpha [B]
        ]
    return in_specs


def _fwd_call(q, k, v, geom, kv_index, q_tile, H):
    B, Lq, C = q.shape
    Lk = k.shape[1]
    D = C // H
    Tq = _pick_tile(q_tile, Lq, Lk)
    scale = 1.0 / math.sqrt(D)
    has_bias = geom is not None
    if kv_index is None:
        kv_index = _identity_index(B)

    in_specs = _grid_spec(B, Lq, Lk, C, Tq, has_bias, H)
    args = [q, k, v]
    if has_bias:
        norm_lines, coords, band, alpha = geom
        args += [
            jax.lax.stop_gradient(norm_lines),
            coords.astype(jnp.float32),
            band.reshape(B).astype(jnp.float32),
            alpha.reshape(B).astype(jnp.float32),
        ]

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=H,
                          has_bias=has_bias, precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq, C), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Lq // Tq),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, Tq, C), lambda b, i, idx: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, Tq), lambda b, i, idx: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * 2 * D,
            bytes_accessed=B * (2 * Lq + 2 * Lk) * C * 2,
            transcendentals=B * H * Lq * Lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(kv_index.astype(jnp.int32), *args)
    return out, lse


def _bwd_call(q, k, v, geom, kv_index, out, lse, g, q_tile, H):
    B, Lq, C = q.shape
    Lk = k.shape[1]
    D = C // H
    Tq = _pick_tile(q_tile, Lq, Lk)
    scale = 1.0 / math.sqrt(D)
    has_bias = geom is not None
    routed = kv_index is not None
    if kv_index is None:
        kv_index = _identity_index(B)

    # delta[b,h,n] = rowsum(dout * out) per head
    delta = jnp.einsum(
        "bnhd,bnhd->bhn",
        g.astype(jnp.float32).reshape(B, Lq, H, D),
        out.astype(jnp.float32).reshape(B, Lq, H, D),
    )

    q_spec = pl.BlockSpec((1, Tq, C), lambda b, i, idx: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Lk, C), lambda b, i, idx: (idx[b], 0, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, H, Tq), lambda b, i, idx: (b, 0, i),
                            memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec]
    args = [q, k, v, g, lse, delta]
    if has_bias:
        norm_lines, coords, band, alpha = geom
        in_specs += [
            pl.BlockSpec((1, Tq, 3), lambda b, i, idx: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Lk), lambda b, i, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [
            jax.lax.stop_gradient(norm_lines),
            coords.astype(jnp.float32),
            band.reshape(B).astype(jnp.float32),
            alpha.reshape(B).astype(jnp.float32),
        ]

    # dk/dv emerge aligned to the QUERY row (gathered layout)
    gathered_spec = pl.BlockSpec((1, Lk, C), lambda b, i, idx: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    dq, dk_g, dv_g = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=H,
                          has_bias=has_bias, precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Lq, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Lk, C), jnp.float32),
            jax.ShapeDtypeStruct((B, Lk, C), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Lq // Tq),
            in_specs=in_specs,
            out_specs=(q_spec, gathered_spec, gathered_spec),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Lq * Lk * D,
            bytes_accessed=B * (4 * Lq + 4 * Lk) * C * 4,
            transcendentals=B * H * Lq * Lk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(kv_index.astype(jnp.int32), *args)

    if routed:
        # scatter-add back to SOURCE rows (inverse permutation for the
        # 2-view swap; general kv routing may hit a row multiple times).
        # The target is shaped like k — its row count can exceed the query
        # batch B (sharded training: local queries route into an
        # all-gathered kv block, parallel/shard_ops.py)
        dk = jnp.zeros(
            (k.shape[0],) + dk_g.shape[1:], dk_g.dtype
        ).at[kv_index].add(dk_g)
        dv = jnp.zeros(
            (v.shape[0],) + dv_g.shape[1:], dv_g.dtype
        ).at[kv_index].add(dv_g)
    else:
        dk, dv = dk_g, dv_g
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _int_zero_cotangent(x):
    """Cotangent for integer inputs must be float0."""
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# --------------------------------------------------------------------- #
# epipolar-bias entry point
# --------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _epi_flash(q, k, v, norm_lines, coords, band, alpha, kv_index,
               q_tile, heads):
    out, _ = _fwd_call(q, k, v, (norm_lines, coords, band, alpha),
                       kv_index, q_tile, heads)
    return out


def _epi_flash_fwd(q, k, v, norm_lines, coords, band, alpha, kv_index,
                   q_tile, heads):
    out, lse = _fwd_call(q, k, v, (norm_lines, coords, band, alpha),
                         kv_index, q_tile, heads)
    return out, (q, k, v, norm_lines, coords, band, alpha, kv_index, out, lse)


def _epi_flash_bwd(q_tile, heads, res, g):
    q, k, v, norm_lines, coords, band, alpha, kv_index, out, lse = res
    dq, dk, dv = _bwd_call(
        q, k, v, (norm_lines, coords, band, alpha), kv_index, out, lse, g,
        q_tile, heads,
    )
    return (
        dq, dk, dv,
        jnp.zeros_like(norm_lines), jnp.zeros_like(coords),
        jnp.zeros_like(band), jnp.zeros_like(alpha),
        None if kv_index is None else _int_zero_cotangent(kv_index),
    )


_epi_flash.defvjp(_epi_flash_fwd, _epi_flash_bwd)


def epi_flash_attention(
    q: jnp.ndarray,           # [B, N, C]  (C = heads * head_dim)
    k: jnp.ndarray,           # [B, Lk, C] SOURCE rows (pre-routing)
    v: jnp.ndarray,           # [B, Lk, C]
    norm_lines: jnp.ndarray,  # [B, N, 3] (ab-normalized epipolar lines)
    coords: jnp.ndarray,      # [2, Lk] key pixel coords (x row, y row)
    band: jnp.ndarray,        # [B]
    alpha: jnp.ndarray,       # [B]
    heads: int = 8,
    kv_index: Optional[jnp.ndarray] = None,  # [B] partner row per query row
    q_tile: int = 512,
) -> jnp.ndarray:
    """Fused epipolar attention in the projections' native [B, N, C] layout.

    kv_index routes keys/values: query row b attends to k[kv_index[b]]
    (the reference's cross-video chunk(2) swap / gather,
    attention_processor.py:575-583) — no materialized gather.
    Differentiable in q/k/v; geometry inputs get zero cotangents (the
    reference detaches the mask too).
    """
    return _epi_flash(q, k, v, norm_lines, coords, band, alpha, kv_index,
                      q_tile, heads)


# --------------------------------------------------------------------- #
# bias-free entry point (big spatial self-attentions)
# --------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, q_tile, heads):
    out, _ = _fwd_call(q, k, v, None, None, q_tile, heads)
    return out


def _flash_fwd(q, k, v, q_tile, heads):
    out, lse = _fwd_call(q, k, v, None, None, q_tile, heads)
    return out, (q, k, v, out, lse)


def _flash_bwd(q_tile, heads, res, g):
    q, k, v, out, lse = res
    return _bwd_call(q, k, v, None, None, out, lse, g, q_tile, heads)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, heads: int = 8, q_tile: int = 512) -> jnp.ndarray:
    """Plain fused attention, q/k/v [B, L, C]; no [L, L] HBM tensors and no
    head-split transposes."""
    return _flash(q, k, v, q_tile, heads)


def flash_supported(Lq: int, Lk: int, C: int, heads: int) -> bool:
    """Shapes the TPU kernel tiles profitably: big rows, aligned lanes."""
    return (
        Lq >= 256 and Lq % 128 == 0 and Lk % 128 == 0
        and C % heads == 0 and (C // heads) % 8 == 0
    )

