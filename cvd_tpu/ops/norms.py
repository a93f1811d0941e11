"""Fused GroupNorm — Pallas TPU kernel.

Profiling the UNet step on v5e showed GroupNorm as the single largest cost
(~59 ms/call across ~270 reduce fusions): XLA picks layouts for the conv
outputs that make the (H, W) stats reductions nearly serial (~16 GB/s
effective). This kernel streams each row tile through VMEM once — stats,
normalize, affine, and (optionally) the SiLU that follows every resnet
GroupNorm, in a single pass.

Group reductions and the group→channel broadcast are done with tiny one-hot
matmuls instead of [G, C/G] reshapes (C/G = 10 for SD1.5 — not a TPU-tileable
minor dimension; the matmuls stay on well-shaped [R, C] x [C, G] operands).

Semantics match torch.nn.GroupNorm / flax nn.GroupNorm: normalize over all
non-leading dims, per-channel affine, stats in f32.

Backward recomputes through the XLA reference implementation (GroupNorm is
~1% of the training step; the forward is what the sampler hammers).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference(x, gamma, beta, groups: int, eps: float, act: Optional[str]):
    """Plain XLA GroupNorm (+ optional SiLU), stats in f32."""
    R, C = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(R, -1, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups, eps, act):
    x = x_ref[...]                       # [Rt, S, C]
    Rt, S, C = x.shape
    cg = C // groups
    xf = x.astype(jnp.float32)

    s1 = jnp.sum(xf, axis=1)             # [Rt, C]
    s2 = jnp.sum(xf * xf, axis=1)        # [Rt, C]

    # one-hot channel->group matrix, built from iota (no [G, C/G] reshapes)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
    gidx = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    M = (cidx == gidx).astype(jnp.float32)          # [C, G]

    n = float(S * cg)
    dot = functools.partial(
        jax.lax.dot_general,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mean_g = dot(s1, M, dimension_numbers=(((1,), (0,)), ((), ()))) / n
    ex2_g = dot(s2, M, dimension_numbers=(((1,), (0,)), ((), ()))) / n
    inv_g = jax.lax.rsqrt(ex2_g - mean_g * mean_g + eps)    # [Rt, G]

    # back to channels: scale_c = gamma * inv, shift_c = beta - mean * scale_c
    inv_c = dot(inv_g, M, dimension_numbers=(((1,), (1,)), ((), ())))
    mean_c = dot(mean_g, M, dimension_numbers=(((1,), (1,)), ((), ())))
    g = gamma_ref[:].astype(jnp.float32) * inv_c            # [Rt, C]
    b = beta_ref[:].astype(jnp.float32) - mean_c * g

    y = xf * g[:, None, :] + b[:, None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


_BLOCK_BYTES = 4 * 1024 * 1024
# Measured on v5e (2026-08-19 same-session A/B, scripts/tpu_measure.sh):
# gating at 8 MiB cuts Mosaic sites 294 -> 233 and warm compile 208.8 ->
# 192.0 s with step time unchanged (271.6 -> 269.9 ms, within drift noise)
# — the gated shapes carry <1% of step traffic, so 8 MiB is the default.
_MIN_BYTES = 8 * 1024 * 1024


def _row_tile(R: int, row_bytes: int) -> int:
    Rt = max(1, _BLOCK_BYTES // max(row_bytes, 1))
    while R % Rt:
        Rt -= 1
    return Rt


def _kernel_call(x3, gamma, beta, groups, eps, act, interpret):
    R, S, C = x3.shape
    Rt = _row_tile(R, S * C * x3.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((R, S, C), x3.dtype),
        grid_spec=pl.GridSpec(
            grid=(R // Rt,),
            in_specs=[
                pl.BlockSpec((Rt, S, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Rt, S, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * R * S * C,
            bytes_accessed=2 * R * S * C * x3.dtype.itemsize,
            transcendentals=R * S * C if act else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x3, gamma, beta)


def _min_bytes() -> int:
    """Compile-diet experiment knob: every unique (R, S, C) Mosaic instance
    costs remote compile time (~66 instances across the e2e pipeline, most
    tiny x1 skip-concat oddballs). Raising this gates small shapes to the
    XLA reference (identical math, negligible step-time delta) in exchange
    for fewer Mosaic compiles. Measured default baked after the TPU A/B."""
    import os

    return int(os.environ.get("CVD_TPU_GN_MIN_BYTES", _MIN_BYTES))


def _under_mesh() -> bool:
    """True while a pipeline/train step traces with an active shard mesh."""
    from cvd_tpu.models import layers as _layers

    return _layers.SHARD_MESH is not None


def _fits_kernel(x3, groups: int, force: bool) -> bool:
    R, S, C = x3.shape
    bytes_total = R * S * C * x3.dtype.itemsize
    return (
        C % groups == 0
        and S % 8 == 0
        # whole-C blocks are legal at any C (equal-to-dimension rule);
        # S tiles the sublane dim
        and S * C * x3.dtype.itemsize <= 2 * _BLOCK_BYTES  # one row per block
        # narrow-C tiles pad to 128 lanes and can spill (tiny smoke models):
        # production channel counts (>=128) only, unless forced for tests
        and (force or (C >= 128 and bytes_total >= _min_bytes()))
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn(x3, gamma, beta, groups, eps, act, interpret):
    return _kernel_call(x3, gamma, beta, groups, eps, act, interpret)


def _fused_gn_fwd(x3, gamma, beta, groups, eps, act, interpret):
    return _fused_gn(x3, gamma, beta, groups, eps, act, interpret), (x3, gamma, beta)


def _fused_gn_bwd(groups, eps, act, interpret, res, g):
    x3, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, g_, b_: _reference(x_, g_, b_, groups, eps, act),
        x3, gamma, beta,
    )
    return vjp(g)


_fused_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    act: Optional[str] = None,
    force_kernel: bool = False,
) -> jnp.ndarray:
    """GroupNorm over all non-leading dims of ``x`` [..., C] (+optional SiLU).

    Dispatches to the fused TPU kernel when shapes tile cleanly; XLA
    reference otherwise (and off-TPU). ``force_kernel`` runs the kernel in
    interpret mode for CPU parity tests.
    """
    R, C = x.shape[0], x.shape[-1]
    x3 = x.reshape(R, -1, C)
    on_tpu = jax.default_backend() == "tpu"
    if not force_kernel and _under_mesh():
        # a bare pallas_call traced under GSPMD forces its operands to
        # gather/replicate; GroupNorm is row-local math XLA shards natively,
        # so mesh programs take the reference path (attention kernels keep
        # their shard_map wrappers in parallel/shard_ops.py)
        return _reference(x3, gamma, beta, num_groups, float(eps), act).reshape(x.shape)
    if (on_tpu or force_kernel) and _fits_kernel(x3, num_groups, force_kernel):
        y = _fused_gn(x3, gamma, beta, num_groups, float(eps), act, not on_tpu)
        return y.reshape(x.shape)
    return _reference(x3, gamma, beta, num_groups, float(eps), act).reshape(x.shape)
