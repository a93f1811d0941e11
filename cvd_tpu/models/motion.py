"""Motion module: per-pixel temporal self-attention (AnimateDiff V3) with
CameraCtrl pose conditioning.

Re-design of the reference ``animatediff/models/motion_module.py`` (
VanillaTemporalModule / TemporalTransformer3DModel / TemporalTransformerBlock
/ TemporalSelfAttention / PositionalEncoding) and of the pose-conditioned
attention processor (``attention_processor.py:228-371``,
``PoseAdaptorAttnProcessor``): the first temporal attention of each block
(name '0' in the reference config) mixes the pose-encoder feature into its
qkv source via a zero-initialized merge layer:

    h' = qkv_merge(h + pose) * scale + h

Token layout is ``[B, F, HW, C]`` — the attention runs over the frame axis
via einsums with (batch, pixel, head) as batch dims, so the module never
physically transposes the video tensor (the reference's ``(b h w) f c``
rearrange costs two HBM round-trips of the full feature map per module;
profiled at ~30ms/UNet-call on v5e). Identical math.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvd_tpu.models.layers import (FusedGroupNorm, FeedForward,
    temporal_positional_encoding,
)


def causal_temporal_mask(kind: str, length: int) -> jnp.ndarray:
    """Temporal attention mask variants (motion_module.py:315-368):
    causal / 2-seq / 0-prev / 0 / wo-self / circle. Returns an additive
    float mask [length, length] (0 allowed, -inf blocked)."""
    import numpy as np

    i = np.arange(length)
    if kind == "causal":
        m = np.tril(np.ones((length, length)))
    elif kind == "2-seq":
        m = np.zeros((length, length))
        m[: length // 2, : length // 2] = 1
        m[-(length // 2):, -(length // 2):] = 1
    elif kind == "0-prev":
        prev = np.maximum(i - 1, 0)
        m = np.zeros((length, length))
        m[:, 0] = 1
        m[i, prev] = 1
    elif kind == "0":
        m = np.zeros((length, length))
        m[:, 0] = 1
    elif kind == "wo-self":
        m = np.ones((length, length))
        m[i, i] = 0
    elif kind == "circle":
        prev = np.maximum(i - 1, 0)
        m = np.eye(length)
        m[i, prev] = 1
        m[0, -1] = 1
    else:
        raise ValueError(kind)
    out = np.where(m == 0, -np.inf, 0.0).astype(np.float32)
    return jnp.asarray(out)


class _SyncLoRA(nn.Module):
    """diffusers ``LoRALinearLayer`` (down normal(std=1/rank), up zero-init,
    no biases) as used by the sync-LoRA branch of the pose-conditioned
    temporal attention (attention_processor.py:262-270). Module name
    ``to_*_lora_sync`` with ``down``/``up`` children mirrors the reference
    state-dict keys (``...processor.to_q_lora_sync.down.weight``) so the
    mechanical key mapping covers it, and the substring "sync" makes the
    trainable-mask group (train_epi_control.py:254) match real params."""

    rank: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.rank, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.normal(1.0 / self.rank), name="down",
        )(x)
        return nn.Dense(
            self.out_features, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="up",
        )(h)


class TemporalSelfAttention(nn.Module):
    """One temporal attention: sinusoidal PE + optional pose conditioning.

    Input [B, N, F, C] — PIXEL-major (already layer-normed by the caller).
    Attention runs over the F axis per pixel. The pixel-major layout is what
    lets the fused kernel read per-head [pixel, frame, dim] tiles with zero
    relayouts; the reference's ``(b h w) f c`` rearrange
    (motion_module.py:378) costs two HBM round trips of the full feature
    map per module.

    sync-LoRA (attention_processor.py:262-270, 341-344): when
    ``sync_lora_rank > 0 and sync_lora_scale != 0`` on a pose-conditioned
    attention, rank-r LoRA deltas are added to q/k/v from the (post-merge)
    qkv source and to the attention output from the post-projection output:
    ``q += s * up(down(x'))`` and ``o = to_out(h); o += s * up(down(o))``.
    """

    dim: int
    heads: int
    pe_max_len: int = 32
    pose_conditioned: bool = False
    pose_scale: float = 1.0
    causal_mask_type: str = ""
    sync_lora_rank: int = 0
    sync_lora_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pose_feature: Optional[jnp.ndarray] = None,
        pab_reuse: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """pab_reuse: optional traced bool — Pyramid Attention Broadcast
        (pipelines/pab.py): reuse the cached attention output instead of
        recomputing."""
        if pab_reuse is not None and not self.is_initializing():
            B, N, F, C = x.shape
            cache = self.variable(
                "pab", "out", lambda: jnp.zeros((B, N, F, C), self.dtype)
            )
            out = jax.lax.cond(
                pab_reuse,
                lambda: cache.value,
                lambda: self._compute(x, pose_feature).astype(self.dtype),
            )
            cache.value = out
            return out
        return self._compute(x, pose_feature)

    def _compute(
        self, x: jnp.ndarray, pose_feature: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        B, N, F, C = x.shape
        # positional encoding over the frame axis (motion_module.py:515-516)
        pe = temporal_positional_encoding(self.pe_max_len, C)[:, :F].astype(x.dtype)
        x = x + pe  # [1, F, C] broadcasts over (B, N)

        if self.pose_conditioned and pose_feature is not None:
            # PoseAdaptorAttnProcessor qkv_merge (attention_processor.py:323-326)
            merge = nn.Dense(
                C,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="qkv_merge",
            )
            x = merge(x + pose_feature.astype(x.dtype)) * self.pose_scale + x

        head_dim = C // self.heads
        from cvd_tpu.models.layers import ProjKernel, fused_matmul

        q, k, v = fused_matmul(
            x,
            (ProjKernel(C, C, name="to_q")(), ProjKernel(C, C, name="to_k")(),
             ProjKernel(C, C, name="to_v")()),
            self.dtype,
        )
        # sync-LoRA on q/k/v: reference adds the deltas to the PROJECTED
        # q/k/v from the same (post-merge) qkv source; only attached to the
        # pose-conditioned attention (unet.py:1098-1101 attaches sync kwargs
        # to PoseAdaptorAttnProcessor alone)
        use_sync = (self.pose_conditioned and self.sync_lora_rank > 0
                    and self.sync_lora_scale != 0.0)
        if use_sync:
            s = self.sync_lora_scale
            q = q + s * _SyncLoRA(self.sync_lora_rank, C, dtype=self.dtype,
                                  name="to_q_lora_sync")(x)
            k = k + s * _SyncLoRA(self.sync_lora_rank, C, dtype=self.dtype,
                                  name="to_k_lora_sync")(x)
            v = v + s * _SyncLoRA(self.sync_lora_rank, C, dtype=self.dtype,
                                  name="to_v_lora_sync")(x)

        from cvd_tpu.models import layers as _layers
        from cvd_tpu.ops.temporal_attn import (
            temporal_flash_attention, temporal_flash_supported,
        )

        mesh = _layers.SHARD_MESH
        supported = (
            _layers.FLASH_SPATIAL
            and temporal_flash_supported(F, N, C, self.heads)
        )
        if mesh is not None:
            from cvd_tpu.parallel.shard_ops import temporal_mesh_ok

            use_sharded = supported and temporal_mesh_ok(mesh, B, F)
        else:
            use_sharded = False
        use_kernel = (
            supported and mesh is None and jax.default_backend() == "tpu"
        )
        if use_sharded or use_kernel:
            # fused kernel: per-head [pixel-tile, F, D] blocks sliced
            # straight out of the pixel-major tensor — zero relayouts
            mask = (
                causal_temporal_mask(self.causal_mask_type, F)
                if self.causal_mask_type else None
            )
            if use_sharded:
                from cvd_tpu.parallel.shard_ops import sharded_temporal_flash

                out = sharded_temporal_flash(q, k, v, mask, self.heads, mesh)
            else:
                out = temporal_flash_attention(q, k, v, mask, heads=self.heads)
        else:
            q = q.reshape(B, N, F, self.heads, head_dim)
            k = k.reshape(B, N, F, self.heads, head_dim)
            v = v.reshape(B, N, F, self.heads, head_dim)
            precision = "highest" if q.dtype == jnp.float32 else None
            logits = jnp.einsum(
                "bnfhd,bnghd->bnhfg", q, k, precision=precision
            ) * (1.0 / math.sqrt(head_dim))
            logits = logits.astype(jnp.float32)
            if self.causal_mask_type:
                logits = logits + causal_temporal_mask(self.causal_mask_type, F)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bnhfg,bnghd->bnfhd", probs, v, precision=precision)
            out = out.reshape(B, N, F, C)
        o = nn.Dense(C, dtype=self.dtype, name="to_out_0")(out)
        if use_sync:
            # reference quirk kept deliberately: the out-LoRA delta is
            # computed from the POST-projection output, not the attention
            # values (attention_processor.py:341-344)
            o = o + self.sync_lora_scale * _SyncLoRA(
                self.sync_lora_rank, C, dtype=self.dtype,
                name="to_out_lora_sync")(o)
        return o


class TemporalTransformerBlock(nn.Module):
    """N temporal attentions + feed-forward, pre-LN residual style
    (motion_module.py:397-460). Token layout [B, N, F, C] (pixel-major);
    LN/FF are token-wise so only the attention cares."""

    dim: int
    heads: int
    num_attention_blocks: int = 2
    pe_max_len: int = 32
    pose_cond_indices: Tuple[int, ...] = (0,)
    pose_scale: float = 1.0
    causal_mask_type: str = ""
    sync_lora_rank: int = 0
    sync_lora_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pose_feature: Optional[jnp.ndarray] = None,
        pab_reuse: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        for i in range(self.num_attention_blocks):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norms_{i}")(x)
            x = (
                TemporalSelfAttention(
                    self.dim,
                    self.heads,
                    self.pe_max_len,
                    pose_conditioned=i in self.pose_cond_indices,
                    pose_scale=self.pose_scale,
                    causal_mask_type=self.causal_mask_type,
                    sync_lora_rank=self.sync_lora_rank,
                    sync_lora_scale=self.sync_lora_scale,
                    dtype=self.dtype,
                    name=f"attention_blocks_{i}",
                )(h, pose_feature, pab_reuse=pab_reuse)
                + x
            )
        from cvd_tpu.models.layers import LayerNormParams

        ln = LayerNormParams(self.dim, name="ff_norm")()
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(x, pre_ln=ln) + x
        return x


class TemporalTransformer(nn.Module):
    """The full motion module for one UNet layer (VanillaTemporalModule).

    Input/output [B, F, H, W, C] with the outer residual connection
    (motion_module.py:370-394). ``zero_initialize`` is a checkpoint-time
    property in the reference; proj_out initializes to zeros here as well so
    a freshly-initialized module is an identity map.
    """

    in_channels: int
    heads: int = 8
    num_transformer_blocks: int = 1
    num_attention_blocks: int = 2
    pe_max_len: int = 32
    pose_cond_indices: Tuple[int, ...] = (0,)
    pose_scale: float = 1.0
    norm_groups: int = 32
    zero_initialize: bool = False
    causal_mask_type: str = ""
    sync_lora_rank: int = 0
    sync_lora_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, pose_feature: Optional[jnp.ndarray] = None,
        pab_reuse: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, F, H, W, C = x.shape
        residual = x
        h = FusedGroupNorm(
            num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )(x.reshape(B * F, H, W, C)).reshape(B, F, H * W, C)
        # pixel-major for the temporal blocks: one transpose in, one out
        # (vs. per-attention relayouts inside XLA/the kernel)
        h = jnp.swapaxes(h, 1, 2)  # [B, N, F, C]
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(h)
        if pose_feature is not None:
            pose_feature = jnp.swapaxes(
                pose_feature.reshape(B, F, H * W, -1), 1, 2
            )
        for i in range(self.num_transformer_blocks):
            h = TemporalTransformerBlock(
                C,
                self.heads,
                self.num_attention_blocks,
                self.pe_max_len,
                self.pose_cond_indices,
                self.pose_scale,
                causal_mask_type=self.causal_mask_type,
                sync_lora_rank=self.sync_lora_rank,
                sync_lora_scale=self.sync_lora_scale,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, pose_feature, pab_reuse=pab_reuse)
        proj_out_init = (
            nn.initializers.zeros if self.zero_initialize else nn.initializers.lecun_normal()
        )
        h = nn.Dense(
            C, kernel_init=proj_out_init, dtype=self.dtype, name="proj_out"
        )(h)
        h = jnp.swapaxes(h, 1, 2)  # back to [B, F, N, C]
        return h.reshape(B, F, H, W, C) + residual
