"""Epi (cross-video synchronization) module — CVD's core novelty.

Re-design of ``animatediff/models/epi_module.py`` + the EpiAttnProcessor
(``attention_processor.py:522-650``): per-frame spatial attention whose
queries come from one video and keys/values from its partner video, with an
additive soft epipolar bias derived from the fundamental matrix between the
paired cameras.

TPU-first changes vs the reference:
* The bias is built from the lines+band factorization
  (cvd_tpu.geometry.epipolar_mask) — exact corner-max band instead of a
  full [HW, HW] max — and can be evaluated inside a fused Pallas attention
  kernel; the XLA path materializes it per attention like the reference.
* No batch-chunking fallback (epi_module.py:424-451): flash-style attention
  bounds memory instead.
* Partner routing (2-view swap / kv_index gather / multi-pair groups) is an
  explicit gather, not a processor side channel.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from cvd_tpu.geometry.epipolar_mask import (
    epipolar_attn_bias_from_lines,
    epipolar_lines,
    homography_lines,
    lines_and_band,
    pixel_grid_coords,
    pseudo_lines,
)
from cvd_tpu.models.layers import FusedGroupNorm, Attention, FeedForward
from cvd_tpu.ops.attention import attention_with_bias


@struct.dataclass
class EpiConditioning:
    """Per-UNet-call epipolar conditioning carried to every epi attention.

    Dynamic leaves are flattened-(video*cfg, frame) batch-major, matching the
    hidden-state batch axis at the epi attentions.
    """

    F_mats: Optional[jnp.ndarray] = None  # [m*B, 3, 3] or [B, 3, 3]
    H_mats: Optional[jnp.ndarray] = None  # [B, 3, 3]
    kv_index: Optional[jnp.ndarray] = None  # [m*B] int32 partner rows
    # static config (random slopes come from the 'epi_slope' flax rng stream)
    F_mat_size: int = struct.field(pytree_node=False, default=256)
    video_length: int = struct.field(pytree_node=False, default=16)
    rand_slope_ff: bool = struct.field(pytree_node=False, default=True)
    mono_direction: bool = struct.field(pytree_node=False, default=False)
    fix_firstframe: bool = struct.field(pytree_node=False, default=False)
    cfg_factor: int = struct.field(pytree_node=False, default=2)
    use_flash_kernel: bool = struct.field(pytree_node=False, default=False)


def _epi_lines(
    cond: EpiConditioning, batch: int, feat_size: int, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Per-query epipolar (or pseudo) line coefficients [B or mB, Q, 3].

    Mirrors EpiEncoding.get_attn_map's three paths (epi_module.py:301-320),
    including the first-frame pseudo-line substitution with one shared slope.
    """
    coords = pixel_grid_coords(feat_size, cond.F_mat_size)
    if cond.H_mats is not None:
        B = cond.H_mats.shape[0]
        slope = _uniform_slope(rng, (B,))
        return homography_lines(cond.H_mats, coords, cond.F_mat_size, slope)
    if cond.F_mats is not None:
        B = cond.F_mats.shape[0]
        lines = epipolar_lines(cond.F_mats, coords)
        slope = _uniform_slope(rng, (1,)) if cond.rand_slope_ff else None
        ff_lines = pseudo_lines(coords[None], slope=slope)
        is_ff = (jnp.arange(B) % cond.video_length) == 0
        return jnp.where(is_ff[:, None, None], ff_lines, lines)
    slope = _uniform_slope(rng, (batch,))
    return pseudo_lines(
        jnp.broadcast_to(coords[None], (batch,) + coords.shape), slope=slope
    )


def _uniform_slope(rng: Optional[jax.Array], shape) -> jnp.ndarray:
    if rng is None:
        # match _require_slope on the materialized-bias path
        # (geometry/epipolar_mask.py): a caller that forgot the rng stream
        # must fail loudly, not get deterministic pseudo-lines
        raise ValueError(
            "pseudo-epipolar lines need a random slope: pass "
            "rngs={'epi_slope': key} to apply() (the reference draws "
            "torch.rand per call, epi_module.py:316)"
        )
    return jax.random.uniform(rng, shape, minval=0.0, maxval=jnp.pi)


def gather_partner_tokens(
    hidden: jnp.ndarray, kv_index: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Key/value source for cross-video attention.

    kv_index None -> 2-view half swap (attention_processor.py:575-576);
    otherwise gather rows, supporting m>1 groups concatenated on the token
    axis (attention_processor.py:577-583).
    """
    B, N, C = hidden.shape
    if kv_index is None:
        half = B // 2
        return jnp.concatenate([hidden[half:], hidden[:half]], axis=0)
    enc = hidden[kv_index]
    if kv_index.shape[0] != B:
        m = kv_index.shape[0] // B
        enc = enc.reshape(m, B, N, C).transpose(1, 2, 0, 3).reshape(B, N * m, C)
    return enc


def regroup_bias(bias: jnp.ndarray, batch: int) -> jnp.ndarray:
    """[m*B, N, N] bias -> [B, N, m*N] aligned with multi-group kv tokens
    (epi_module.py:398-402)."""
    mB, N, _ = bias.shape
    if mB == batch:
        return bias
    m = mB // batch
    return bias.reshape(m, batch, N, N).transpose(1, 2, 3, 0).reshape(batch, N, N * m)


class EpiSelfAttention(nn.Module):
    """One cross-video attention with epipolar bias.

    Input [B, N, C] with B = (views * cfg * frames) and N = H*W. Returns
    (out, {"query", "key"}) — the q/k token maps feed the training-time
    epipolar-distance auxiliary loss (train_epi_control.py:607).
    """

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cond: Optional[EpiConditioning], pre_ln=None,
        pab_reuse: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """pre_ln: optional (scale, bias) of the preceding LayerNorm — then
        ``x`` is UNNORMALIZED and the norm folds into the q/k/v projections.
        Valid because LN is per-token, so it commutes with the partner-row
        gather (LN(x)[route] == LN(x[route])).

        pab_reuse: optional traced bool — Pyramid Attention Broadcast
        (pipelines/pab.py). Inference-only: on the PAB path the aux
        query/key maps come back as zeros (the training loss that consumes
        them never runs with PAB enabled)."""
        if pab_reuse is not None and not self.is_initializing():
            B, N, C = x.shape
            cache = self.variable(
                "pab", "out", lambda: jnp.zeros((B, N, C), self.dtype)
            )
            out = jax.lax.cond(
                pab_reuse,
                lambda: cache.value,
                lambda: self._compute(x, cond, pre_ln)[0].astype(self.dtype),
            )
            cache.value = out
            z = jnp.zeros((B, N, C), self.dtype)
            return out, {"query": z, "key": z}
        return self._compute(x, cond, pre_ln)

    def _compute(
        self, x: jnp.ndarray, cond: Optional[EpiConditioning], pre_ln=None
    ) -> Tuple[jnp.ndarray, dict]:
        B, N, C = x.shape
        feat_size = int(round(N**0.5))
        assert feat_size * feat_size == N, "epi attention requires square grids"

        bias = None
        kv_index = None
        if cond is not None:
            if cond.mono_direction:
                # the reference rejects this path too ("kv_index may have
                # bug here. Not supported", attention_processor.py:622)
                raise NotImplementedError(
                    "mono_direction is not supported (reference parity: "
                    "attention_processor.py:622 raises as well)"
                )
            kv_index = cond.kv_index
            # Fresh slope per attention call, like the reference (each
            # get_attn_map call draws its own torch.rand). Flax folds the
            # module path into the stream, so every epi attention in the
            # UNet sees a distinct key per apply().
            needs_rng = (
                cond.H_mats is not None
                or (cond.F_mats is not None and cond.rand_slope_ff)
                or (cond.F_mats is None and cond.H_mats is None)
            )
            if needs_rng and not self.has_rng("epi_slope"):
                raise ValueError(
                    "this epi conditioning draws random slopes (H_mats / "
                    "rand_slope_ff / pose-free) but no 'epi_slope' rng "
                    "stream was provided; pass rngs={'epi_slope': key} to "
                    "apply()"
                )
            rng = self.make_rng("epi_slope") if needs_rng else None
            lines = _epi_lines(cond, B, feat_size, rng)

        inner = C
        head_dim = C // self.heads
        from cvd_tpu.models.layers import ProjKernel, fused_matmul
        from cvd_tpu.ops.ln_matmul import layer_norm_matmul

        wq = ProjKernel(C, inner, name="to_q")()
        wk = ProjKernel(C, inner, name="to_k")()
        wv = ProjKernel(C, inner, name="to_v")()

        def project(tokens, kernels):
            if pre_ln is not None:
                return layer_norm_matmul(
                    tokens.astype(self.dtype), pre_ln[0], pre_ln[1],
                    list(kernels), [None] * len(kernels),
                )
            return fused_matmul(tokens, kernels, self.dtype)

        multi_group = (
            cond is not None
            and cond.kv_index is not None
            and cond.kv_index.shape[0] != B
        )
        from cvd_tpu.models import layers as _layers

        mesh = _layers.SHARD_MESH
        kernel_eligible = (
            cond is not None
            and cond.use_flash_kernel
            and not multi_group
            and feat_size >= 16  # tiny grids: XLA wins, skip kernel launch
        )
        use_sharded = False
        if kernel_eligible and mesh is not None:
            from cvd_tpu.parallel.shard_ops import mesh_ok_for_kernels

            Fw = cond.video_length
            use_sharded = (
                B % Fw == 0 and mesh_ok_for_kernels(mesh, B // Fw, Fw)
            )
            kernel_eligible = use_sharded  # mesh present: sharded or XLA
        use_kernel = kernel_eligible
        if use_kernel:
            # fused Pallas path: project SOURCE rows, route the partner's
            # k/v inside the kernel (BlockSpec index over kv_index — no
            # materialized gather), bias evaluated in VMEM from factored
            # geometry.
            from cvd_tpu.ops.epi_flash import epi_flash_attention

            if kv_index is None:
                half = B // 2
                route = jnp.concatenate(
                    [jnp.arange(half, B), jnp.arange(0, half)]
                ).astype(jnp.int32)
            else:
                route = kv_index.astype(jnp.int32)
            # q/k/v of the SOURCE rows in one fused matmul (x read once)
            q_tok, k_tok, v_tok = project(x, (wq, wk, wv))
            coords = pixel_grid_coords(feat_size, cond.F_mat_size)
            coords_xy = coords[:, :2].T  # [2, N] key pixel x/y rows
            norm_lines, band, alpha = lines_and_band(
                jax.lax.stop_gradient(lines), feat_size, cond.F_mat_size
            )
            if use_sharded:
                from cvd_tpu.parallel.shard_ops import sharded_epi_flash

                out = sharded_epi_flash(
                    q_tok, k_tok, v_tok, norm_lines, coords_xy, band, alpha,
                    self.heads, route, cond.video_length, mesh,
                )
            else:
                out = epi_flash_attention(
                    q_tok, k_tok, v_tok, norm_lines, coords_xy, band, alpha,
                    heads=self.heads, kv_index=route,
                )
            # aux key map = gathered rows (dead code unless consumed, so
            # inference pays nothing; training uses the last epi layer only)
            k_tok = k_tok[route]
        else:
            (q_tok,) = project(x, (wq,))
            enc = gather_partner_tokens(x, kv_index)
            k_tok, v_tok = project(enc, (wk, wv))
            q = q_tok.reshape(B, -1, self.heads, head_dim).transpose(0, 2, 1, 3)
            k = k_tok.reshape(B, -1, self.heads, head_dim).transpose(0, 2, 1, 3)
            v = v_tok.reshape(B, -1, self.heads, head_dim).transpose(0, 2, 1, 3)
            bias = None
            if cond is not None:
                coords = pixel_grid_coords(feat_size, cond.F_mat_size)
                bias = epipolar_attn_bias_from_lines(
                    lines, coords, feat_size, cond.F_mat_size
                )
                bias = regroup_bias(bias, B)
            out = attention_with_bias(q, k, v, bias)
            out = out.transpose(0, 2, 1, 3).reshape(B, -1, inner)

        if cond is not None and cond.fix_firstframe:
            # average first-frame V across views, broadcast back
            # (attention_processor.py:629-635); token layout [B, N, C]
            v_self = v_tok if use_kernel else project(x, (wv,))[0]
            f = cond.video_length
            t = cond.cfg_factor
            views = B // (t * f)
            vr = v_self.reshape(views, t, f, N, inner)
            ff = jnp.mean(vr[:, :, 0:1], axis=0, keepdims=True)
            ff = jnp.broadcast_to(ff, vr[:, :, 0:1].shape)
            out_r = out.reshape(views, t, f, N, inner)
            out_r = out_r.at[:, :, 0:1].set(ff)
            out = out_r.reshape(B, N, inner)

        out = nn.Dense(C, dtype=self.dtype, name="to_out_0")(out)
        return out, {"query": q_tok, "key": k_tok}


class EpiTransformerBlock(nn.Module):
    """num_attention_blocks x (LN -> EpiSelfAttention -> +res) then FF
    (epi_module.py:191-269)."""

    dim: int
    heads: int
    num_attention_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[EpiConditioning],
                 pab_reuse: Optional[jnp.ndarray] = None):
        from cvd_tpu.models.layers import LayerNormParams

        aux = []
        for i in range(self.num_attention_blocks):
            # LN folds into the attention's q/k/v projections
            ln = LayerNormParams(self.dim, name=f"norms_{i}")()
            res, qk = EpiSelfAttention(
                self.dim, self.heads, dtype=self.dtype, name=f"attention_blocks_{i}"
            )(x, cond, pre_ln=ln, pab_reuse=pab_reuse)
            x = x + res
            aux.append(qk)
        ln = LayerNormParams(self.dim, name="ff_norm")()
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(x, pre_ln=ln) + x
        return x, aux


class EpiTransformer(nn.Module):
    """Full epi module for one UNet layer (EpiModule/EpiTransformer3DModel).

    Input/output [B, F, H, W, C]; outer residual; zero-init proj_out so an
    untrained module is the identity (epi_module.py:81-82).
    """

    in_channels: int
    heads: int = 8
    num_transformer_blocks: int = 1
    num_attention_blocks: int = 2
    norm_groups: int = 32
    zero_initialize: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[EpiConditioning],
                 pab_reuse: Optional[jnp.ndarray] = None):
        B, F, H, W, C = x.shape
        residual = x
        h = FusedGroupNorm(
            num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x.reshape(B * F, H, W, C))
        h = h.reshape(B * F, H * W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        aux_all = []
        for i in range(self.num_transformer_blocks):
            h, aux = EpiTransformerBlock(
                C,
                self.heads,
                self.num_attention_blocks,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, cond, pab_reuse=pab_reuse)
            aux_all += aux
        proj_out_init = (
            nn.initializers.zeros if self.zero_initialize else nn.initializers.lecun_normal()
        )
        h = nn.Dense(C, kernel_init=proj_out_init, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(B, F, H, W, C)
        return h + residual, aux_all
