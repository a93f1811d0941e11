"""Fused per-pixel temporal attention — Pallas TPU kernel.

The motion module (AnimateDiff; reference
``animatediff/models/motion_module.py:484-550``) attends over the FRAME
axis independently for every pixel: 16x16 logits per (pixel, head). As an
XLA einsum this is pathological on TPU: the batched matmul wants
(batch=B*N*H)-major operand layouts, so XLA inserts full-tensor transpose
copies (~12 ms/UNet-step profiled on v5e for the [B,F,N,H,D] relayouts),
and the 16x16x40 matmuls themselves can't tile the 128x128 MXU.

The kernel instead streams the video tensor in PIXEL-major [B, N, F, C]
layout (the motion module transposes once at entry/exit), one (batch row,
pixel tile) block at a time, and computes the whole attention (all heads,
both matmuls, f32 softmax) in VMEM. Per-head [Tn, F, D] tiles slice out
with the batch dim already leading, so there are no relayouts anywhere.
The op is memory-bound (~1.3 GF vs 168 MB per res-1 attention), so the
win is doing exactly one HBM round trip of q/k/v/out.

The backward pass needs no cross-tile accumulation (pixels are
independent), so it is a single kernel that recomputes probabilities and
emits dq/dk/dv in one pass — no saved lse, no sequential grid axis.

Supports the additive [F, F] temporal masks of the causal variants
(motion_module.py:315-368).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret():
    return jax.default_backend() != "tpu"


def _fwd_kernel(*refs, scale, heads, has_mask, precision):
    if has_mask:
        q_ref, k_ref, v_ref, mask_ref, out_ref = refs
    else:
        q_ref, k_ref, v_ref, out_ref = refs
        mask_ref = None

    C = q_ref.shape[-1]
    D = C // heads
    # pixel-major blocks [1, Tn, F, C]: per-head [Tn, F, D] tiles slice out
    # directly with the batch (pixel) dim already at position 0 — no
    # relayouts at all (profiled: in-kernel transposes cost ~1.5-3 ms/attn)
    dims_qk = (((2,), (2,)), ((0,), (0,)))   # [Tn,F,D]x[Tn,G,D] -> [Tn,F,G]
    dims_pv = (((2,), (1,)), ((0,), (0,)))   # [Tn,F,G]x[Tn,G,D] -> [Tn,F,D]
    for h in range(heads):
        qh = q_ref[0, :, :, h * D:(h + 1) * D]   # [Tn, F, D]
        kh = k_ref[0, :, :, h * D:(h + 1) * D]
        vh = v_ref[0, :, :, h * D:(h + 1) * D]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=dims_qk,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                                # [Tn, F, G] f32
        if mask_ref is not None:
            logits = logits + mask_ref[:, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=dims_pv,
            preferred_element_type=jnp.float32, precision=precision,
        )                                        # [Tn, F, D]
        out_ref[0, :, :, h * D:(h + 1) * D] = oh.astype(out_ref.dtype)


def _bwd_kernel(*refs, scale, heads, has_mask, precision):
    if has_mask:
        q_ref, k_ref, v_ref, do_ref, mask_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        mask_ref = None

    C = q_ref.shape[-1]
    D = C // heads
    dims_qk = (((2,), (2,)), ((0,), (0,)))   # [Tn,F,D]x[Tn,G,D] -> [Tn,F,G]
    dims_pv = (((2,), (1,)), ((0,), (0,)))   # [Tn,F,G]x[Tn,G,D] -> [Tn,F,D]
    dims_ptv = (((1,), (1,)), ((0,), (0,)))  # [Tn,F,G]x[Tn,F,D] -> [Tn,G,D]
    for h in range(heads):
        qh = q_ref[0, :, :, h * D:(h + 1) * D]   # [Tn, F, D]
        kh = k_ref[0, :, :, h * D:(h + 1) * D]
        vh = v_ref[0, :, :, h * D:(h + 1) * D]
        doh = do_ref[0, :, :, h * D:(h + 1) * D].astype(jnp.float32)

        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=dims_qk,
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        if mask_ref is not None:
            logits = logits + mask_ref[:, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)   # [Tn, F, G]

        # dp[n,f,g] = sum_d do[n,f,d] v[n,g,d]
        dp = jax.lax.dot_general(
            doh, vh.astype(jnp.float32), dimension_numbers=dims_qk,
            preferred_element_type=jnp.float32, precision=precision,
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale                # [Tn, F, G]

        # dq[n,f,d] = sum_g ds[n,f,g] k[n,g,d]
        dq_ref[0, :, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            ds, kh.astype(jnp.float32), dimension_numbers=dims_pv,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(dq_ref.dtype)                       # [Tn, F, D]
        # dk[n,g,d] = sum_f ds[n,f,g] q[n,f,d]
        dk_ref[0, :, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            ds, qh.astype(jnp.float32), dimension_numbers=dims_ptv,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(dk_ref.dtype)                       # [Tn, G, D]
        # dv[n,g,d] = sum_f p[n,f,g] do[n,f,d]
        dv_ref[0, :, :, h * D:(h + 1) * D] = jax.lax.dot_general(
            p, doh, dimension_numbers=dims_ptv,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(dv_ref.dtype)                       # [Tn, G, D]


def _precision_for(dtype):
    return (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _pick_tile(N: int, n_tile: int, F: int, C: int, itemsize: int) -> int:
    """Pixel-tile size, capped so one [Tn, F, C] ref block stays ~<=2 MB —
    larger f32/wide-channel blocks (e.g. the pose encoder's [*,16,640] f32
    attention) make Mosaic's unrolled head loop spill tens of MB of
    registers and blow the 128 MB VMEM budget."""
    budget = 2 * 1024 * 1024
    cap = max(budget // max(F * C * itemsize, 1), 8)
    cap = 1 << (cap.bit_length() - 1)  # round down to a power of two
    Tn = min(n_tile, N, cap)
    while N % Tn:
        Tn //= 2
    return max(Tn, 8)


def _specs(B, N, F, G, C, Tn, has_mask):
    """q blocks carry F (local) frames, k/v blocks G (possibly all-gathered)
    frames; mask is [F, G]."""
    blk = pl.BlockSpec((1, Tn, F, C), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, Tn, G, C), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [blk, kv_blk, kv_blk]
    if has_mask:
        in_specs.append(pl.BlockSpec((F, G), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return blk, kv_blk, in_specs


def _fwd_call(q, k, v, mask, heads, n_tile):
    B, N, F, C = q.shape
    G = k.shape[2]
    Tn = _pick_tile(N, n_tile, max(F, G), C, q.dtype.itemsize)
    scale = 1.0 / math.sqrt(C // heads)
    has_mask = mask is not None
    blk, _, in_specs = _specs(B, N, F, G, C, Tn, has_mask)
    args = [q, k, v] + ([mask.astype(jnp.float32)] if has_mask else [])
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=heads,
                          has_mask=has_mask,
                          precision=_precision_for(q.dtype)),
        out_shape=jax.ShapeDtypeStruct((B, N, F, C), q.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, N // Tn), in_specs=in_specs, out_specs=blk,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * heads * F * F * (C // heads),
            bytes_accessed=4 * B * F * N * C * 2,
            transcendentals=B * N * heads * F * F,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*args)


def _bwd_call(q, k, v, mask, heads, n_tile, g):
    B, N, F, C = q.shape
    G = k.shape[2]
    Tn = _pick_tile(N, n_tile, max(F, G), C, 4)
    scale = 1.0 / math.sqrt(C // heads)
    has_mask = mask is not None
    blk, kv_blk, in_specs = _specs(B, N, F, G, C, Tn, has_mask)
    in_specs.insert(3, blk)  # do
    args = [q, k, v, g] + ([mask.astype(jnp.float32)] if has_mask else [])
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, heads=heads,
                          has_mask=has_mask,
                          precision=_precision_for(q.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, F, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, G, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N, G, C), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(B, N // Tn), in_specs=in_specs,
            out_specs=(blk, kv_blk, kv_blk),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * B * N * heads * F * F * (C // heads),
            bytes_accessed=7 * B * F * N * C * 4,
            transcendentals=B * N * heads * F * F,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*args)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _temporal(q, k, v, mask, heads, n_tile):
    return _fwd_call(q, k, v, mask, heads, n_tile)


def _temporal_fwd(q, k, v, mask, heads, n_tile):
    out = _fwd_call(q, k, v, mask, heads, n_tile)
    return out, (q, k, v, mask)


def _temporal_bwd(heads, n_tile, res, g):
    q, k, v, mask = res
    dq, dk, dv = _bwd_call(q, k, v, mask, heads, n_tile, g)
    return dq, dk, dv, None if mask is None else jnp.zeros_like(mask)


_temporal.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_flash_attention(
    q: jnp.ndarray,                    # [B, N, F, C] (pixel-major)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # additive [F, F]
    heads: int = 8,
    n_tile: int = 256,
) -> jnp.ndarray:
    """Per-pixel attention over the frame axis, fused, in pixel-major
    layout (per-head tiles need no relayout)."""
    return _temporal(q, k, v, mask, heads, n_tile)


def temporal_flash_supported(F: int, N: int, C: int, heads: int) -> bool:
    """Pixel tiles need lane-aligned rows; tiny grids stay on XLA."""
    return N >= 128 and N % 128 == 0 and C % heads == 0 and F >= 2
