"""Fused LayerNorm -> matmul — Pallas TPU kernel.

Every transformer block in the UNet runs LayerNorm immediately followed by
one or more projections of the SAME normalized tokens (fused q/k/v, the
cross-attention q, the GEGLU feed-forward input). XLA materializes the LN
output in HBM and re-reads it for the matmul; this kernel standardizes each
token tile in VMEM and feeds the MXU directly, eliminating the LN round
trip entirely.

The affine part of LN folds into the weights at trace time:

    LN(x) @ W = x_hat @ (gamma[:, None] * W) + beta @ W      (+ W's bias)

so the kernel only standardizes (mean/var over C, f32 stats) and multiplies
the pre-folded weight. Grid is (token tiles, output tiles); the x tile's
block index is constant along the output-tile axis so Mosaic keeps it
resident in VMEM across the inner loop.

Backward recomputes through the XLA reference (like ops/norms.py): the
sampler is what hammers this path; training keeps full differentiability.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _standardize(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps)


def _reference(x, w_folded, b_folded, eps):
    xh = _standardize(x, eps).astype(x.dtype)
    precision = "highest" if x.dtype == jnp.float32 else None
    return jnp.dot(xh, w_folded.astype(x.dtype), precision=precision) + (
        b_folded.astype(x.dtype) if b_folded is not None else 0
    )


def _ln_mm_kernel(x_ref, w_ref, b_ref, o_ref, *, eps):
    xh = _standardize(x_ref[...], eps)          # [Tt, C] f32
    w = w_ref[...]                              # [C, Kt]
    if w.dtype == jnp.float32:
        acc = jax.lax.dot_general(
            xh, w, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jax.lax.dot_general(
            xh.astype(w.dtype), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[...].astype(jnp.float32)  # [1, Kt] broadcasts
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_tile(total: int, target: int, align: int) -> int:
    t = min(total, target)
    t = max(align, t - t % align)
    while total % t:
        t -= align
    return max(t, align)


def _kernel_call(x2, w, b, eps, interpret):
    T, C = x2.shape
    K = w.shape[1]
    Tt = _pick_tile(T, 512, 8)
    Kt = _pick_tile(K, 1024, 128)
    return pl.pallas_call(
        functools.partial(_ln_mm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((T, K), x2.dtype),
        grid_spec=pl.GridSpec(
            grid=(T // Tt, K // Kt),
            in_specs=[
                pl.BlockSpec((Tt, C), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, Kt), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Kt), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Tt, Kt), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * K + 6 * T * C,
            bytes_accessed=(T * C + C * K + T * K) * x2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, w, b.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln_mm(x2, w, b, eps, interpret):
    return _kernel_call(x2, w, b, eps, interpret)


def _fused_ln_mm_fwd(x2, w, b, eps, interpret):
    return _fused_ln_mm(x2, w, b, eps, interpret), (x2, w, b)


def _fused_ln_mm_bwd(eps, interpret, res, g):
    x2, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _reference(x_, w_, b_, eps), x2, w, b)
    return vjp(g)


_fused_ln_mm.defvjp(_fused_ln_mm_fwd, _fused_ln_mm_bwd)


def _min_bytes() -> int:
    """Compile-diet knob (see ops/norms.py): raise to gate small/rare
    shapes to the XLA LN-then-matmul path and cut Mosaic compile count.
    8 MiB default measured on v5e 2026-08-19 (compile -17 s, step-time
    delta within noise)."""
    import os

    return int(os.environ.get("CVD_TPU_LNMM_MIN_BYTES", 8 * 1024 * 1024))


def _fits_kernel(T: int, C: int, K: int, itemsize: int, force: bool) -> bool:
    return (
        T % 8 == 0
        and C % 128 == 0 and K % 128 == 0
        and C * itemsize <= 64 * 1024     # one row tile spans full C
        and (force or T * C * itemsize >= _min_bytes())
    )


def layer_norm_matmul(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[Optional[jnp.ndarray]],
    eps: float = 1e-5,
    force_kernel: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """(LayerNorm(x) @ W_i + b_i for each W_i), with one fused kernel over
    the concatenated W. x: [..., C]; kernels: [C, K_i] (flax layout).

    Off-TPU (or awkward shapes) falls back to LN-then-matmul XLA reference
    with identical semantics.
    """
    C = x.shape[-1]
    lead = x.shape[:-1]
    T = 1
    for d in lead:
        T *= d
    K = sum(w.shape[1] for w in kernels)
    dtype = x.dtype

    splits, acc = [], 0
    for w in list(kernels)[:-1]:
        acc += w.shape[1]
        splits.append(acc)

    on_tpu = jax.default_backend() == "tpu"
    if not force_kernel:
        # bare pallas_call under GSPMD forces operand replication; LN+matmul
        # is row-local so mesh programs take the XLA path (see ops/norms.py)
        from cvd_tpu.ops.norms import _under_mesh

        if _under_mesh():
            on_tpu = False
    if (on_tpu or force_kernel) and _fits_kernel(T, C, K, dtype.itemsize,
                                                 force_kernel):
        gf = gamma.astype(jnp.float32)
        bf = beta.astype(jnp.float32)
        w_all = jnp.concatenate(
            [w.astype(jnp.float32) for w in kernels], axis=1
        )
        w_folded = gf[:, None] * w_all
        b_folded = bf @ w_all
        b_extra = jnp.concatenate([
            (b.astype(jnp.float32) if b is not None
             else jnp.zeros((w.shape[1],), jnp.float32))
            for w, b in zip(kernels, biases)
        ])
        b_folded = b_folded + b_extra
        if dtype != jnp.float32:
            w_folded = w_folded.astype(dtype)
        out = _fused_ln_mm(
            x.reshape(T, C), w_folded, b_folded, float(eps), not on_tpu
        )
        out = out.reshape(lead + (K,))
    else:
        xh = _standardize(x, eps)
        y = (xh * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(dtype)
        precision = "highest" if dtype == jnp.float32 else None
        w_all = jnp.concatenate([w.astype(dtype) for w in kernels], axis=1)
        out = jnp.dot(y, w_all, precision=precision)
        b_all = jnp.concatenate([
            (b.astype(dtype) if b is not None
             else jnp.zeros((w.shape[1],), dtype))
            for w, b in zip(kernels, biases)
        ])
        out = out + b_all
    return tuple(jnp.split(out, splits, axis=-1))
