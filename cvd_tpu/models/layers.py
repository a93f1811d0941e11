"""Shared Flax building blocks for the SD1.5-family UNet, pose encoder & VAE.

All spatial tensors are channels-last ``[..., H, W, C]`` (TPU-native conv
layout). Video tensors are ``[B, F, H, W, C]``; per-frame 2D ops fold frames
into the batch. Parameter structures are chosen so PyTorch checkpoints map
with a mechanical rule: torch ``Linear(w[o,i])`` -> flax kernel ``w.T``;
torch ``Conv2d(w[o,i,kh,kw])`` -> flax kernel ``w.transpose(2,3,1,0)``.

Numerics follow diffusers' modules (referenced per class) so imported SD1.5
weights reproduce reference activations.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_time_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """diffusers ``Timesteps``/``get_timestep_embedding`` semantics.

    timesteps: [B] (float or int) -> [B, dim].
    """
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], -1) if flip_sin_to_cos else jnp.concatenate([sin, cos], -1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def temporal_positional_encoding(length: int, d_model: int) -> jnp.ndarray:
    """AnimateDiff motion-module sinusoid (motion_module.py:463-481): [1, L, D]."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe[None]


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class FusedGroupNorm(nn.Module):
    """Drop-in nn.GroupNorm (same ``scale``/``bias`` params) routed through
    the fused Pallas kernel on TPU (cvd_tpu.ops.norms — GroupNorm was the
    UNet's largest single cost under XLA's layout choices). ``act='silu'``
    folds the activation that follows most UNet GroupNorms into the pass."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cvd_tpu.ops.norms import group_norm

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm(
            x, scale, bias, self.num_groups, self.epsilon, act=self.act
        )


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis; matches torch.nn.GroupNorm."""

    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # name keeps the param path identical to the previous nn.GroupNorm
        return FusedGroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, dtype=self.dtype,
            name="GroupNorm_0",
        )(x)


def group_norm_per_frame(norm: nn.Module, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a GroupNorm to [B, F, H, W, C] per frame (InflatedGroupNorm,
    resnet.py:30-40): statistics are computed within each frame."""
    B, F = x.shape[:2]
    out = norm(x.reshape((B * F,) + x.shape[2:]))
    return out.reshape(x.shape)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)


class FeedForward(nn.Module):
    """diffusers FeedForward with GEGLU: proj(dim -> 2*4dim) -> x*gelu(g) -> out."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre_ln=None) -> jnp.ndarray:
        """pre_ln: optional (scale, bias) of the preceding LayerNorm — when
        given, ``x`` is UNNORMALIZED and the norm fuses into the GEGLU
        projection (ops.ln_matmul)."""
        inner = self.dim * self.mult
        if pre_ln is not None:
            from cvd_tpu.ops.ln_matmul import layer_norm_matmul

            w0, b0 = DenseParams(x.shape[-1], inner * 2, name="net_0_proj")()
            (h,) = layer_norm_matmul(
                x.astype(self.dtype), pre_ln[0], pre_ln[1], [w0], [b0]
            )
        else:
            h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


# trace-time switches set by the pipelines before tracing:
# FLASH_SPATIAL — master enable for the fused attention kernels.
# SHARD_MESH — a ("rows","frames") mesh: attention ops drop to shard_map
#   wrappers (parallel/shard_ops.py) so the Pallas kernels run per-shard
#   with explicit collectives. A bare pallas_call under GSPMD would force
#   its operands to gather/replicate, hence the wrapper indirection.
FLASH_SPATIAL = True
SHARD_MESH = None


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention math (softmax in f32): q,k,v [..., heads, L, D].

    Pure XLA path. Big bias-free attentions are routed to the fused Pallas
    kernel by ``Attention`` BEFORE the head split (the kernel takes the
    projections' native [B, L, C] layout, so no transpose copies).
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    precision = "highest" if q.dtype == jnp.float32 else None
    logits = jnp.einsum("...qd,...kd->...qk", q, k, precision=precision) * scale
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v, precision=precision)


class ProjKernel(nn.Module):
    """Bias-free projection weight with nn.Dense-compatible param naming
    (``<name>/kernel``), returned as an array instead of being applied —
    lets several projections sharing one input fuse into a single matmul
    (q/k/v read the activations once instead of three times; one wide MXU
    call instead of three narrow ones)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )


class DenseParams(nn.Module):
    """Dense kernel+bias with nn.Dense-compatible param naming, returned as
    arrays for use inside fused kernels."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class LayerNormParams(nn.Module):
    """LayerNorm scale/bias with nn.LayerNorm-compatible param naming,
    returned as arrays so the norm folds into the following projection
    (ops.ln_matmul) instead of round-tripping through HBM."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


def fused_matmul(x: jnp.ndarray, kernels, dtype) -> Tuple[jnp.ndarray, ...]:
    """x @ concat(kernels) split back per kernel. The concat is
    loop-invariant so XLA hoists it out of sampling scans (one-time cost).

    x is cast to ``dtype`` like the nn.Dense(dtype=...) calls this replaces
    — otherwise an f32 activation meeting bf16 weights silently promotes
    the matmul and everything downstream back to f32."""
    x = x.astype(dtype)
    w = jnp.concatenate([k.astype(dtype) for k in kernels], axis=1)
    out = jnp.dot(
        x, w,
        precision="highest" if x.dtype == jnp.float32 else None,
    )
    splits, acc = [], 0
    for k in kernels[:-1]:
        acc += k.shape[1]
        splits.append(acc)
    return tuple(jnp.split(out, splits, axis=-1))


class LoRADelta(nn.Module):
    """down->up low-rank delta (diffusers LoRALinearLayer: down has no bias,
    up zero-initialized so the delta starts at 0)."""

    out_features: int
    rank: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.rank, use_bias=False, dtype=self.dtype, name="down")(x)
        return nn.Dense(
            self.out_features, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="up",
        )(h)


class Attention(nn.Module):
    """Multi-head attention matching diffusers ``Attention``.

    to_q/to_k/to_v without bias, to_out.0 with bias (defaults). Inputs/outputs
    are token-major: [B, L, C]; context [B, Lk, C_ctx] for cross attention.
    ``bias`` broadcasts over heads: [B, Lq, Lk] or [B, heads, Lq, Lk].

    With ``lora_rank > 0`` each projection gains a LoRA delta scaled at call
    time (``lora_scale``) — the reference's CustomizedLoRAAttnProcessor
    (attention_processor.py:113-225) with set_image_layer_lora_scale support.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    out_bias: bool = True
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        return_qk: bool = False,
        lora_scale: float = 1.0,
        pre_ln=None,
        pab_reuse: Optional[jnp.ndarray] = None,
    ):
        """pre_ln: optional (scale, bias) of the preceding LayerNorm — the
        caller then passes UNNORMALIZED hidden_states and the norm fuses
        into the q/k/v projection (ops.ln_matmul). Context tokens are never
        normalized by that norm (cross attention norms queries only).

        pab_reuse: optional traced bool scalar — Pyramid Attention
        Broadcast (pipelines/pab.py). True: return the output cached in
        the "pab" variable collection instead of computing; the lax.cond
        skips the projections and the attention entirely on reuse steps.
        """
        if pab_reuse is not None and not self.is_initializing():
            assert not return_qk, "PAB caching does not support return_qk"
            B, Lq = hidden_states.shape[:2]
            cache = self.variable(
                "pab", "out",
                lambda: jnp.zeros((B, Lq, self.query_dim), self.dtype),
            )
            out = jax.lax.cond(
                pab_reuse,
                lambda: cache.value,
                lambda: self._compute(
                    hidden_states, encoder_hidden_states, bias, False,
                    lora_scale, pre_ln,
                ).astype(self.dtype),
            )
            cache.value = out
            return out
        return self._compute(hidden_states, encoder_hidden_states, bias,
                             return_qk, lora_scale, pre_ln)

    def _compute(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        return_qk: bool = False,
        lora_scale: float = 1.0,
        pre_ln=None,
    ):
        inner = self.heads * self.dim_head
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        C_in = hidden_states.shape[-1]
        C_ctx = ctx.shape[-1]
        wq = ProjKernel(C_in, inner, name="to_q")()
        wk = ProjKernel(C_ctx, inner, name="to_k")()
        wv = ProjKernel(C_ctx, inner, name="to_v")()
        if pre_ln is not None:
            assert self.lora_rank == 0, "LoRA deltas need the normed tokens"
            from cvd_tpu.ops.ln_matmul import layer_norm_matmul

            x_in = hidden_states.astype(self.dtype)
            if encoder_hidden_states is None:
                q, k, v = layer_norm_matmul(
                    x_in, pre_ln[0], pre_ln[1], [wq, wk, wv], [None] * 3
                )
            else:
                (q,) = layer_norm_matmul(
                    x_in, pre_ln[0], pre_ln[1], [wq], [None]
                )
                k, v = fused_matmul(ctx, (wk, wv), self.dtype)
        elif encoder_hidden_states is None:
            # self-attention: q/k/v fused into one matmul (x read once)
            q, k, v = fused_matmul(hidden_states, (wq, wk, wv), self.dtype)
        else:
            (q,) = fused_matmul(hidden_states, (wq,), self.dtype)
            k, v = fused_matmul(ctx, (wk, wv), self.dtype)
        if self.lora_rank > 0:
            q = q + lora_scale * LoRADelta(inner, self.lora_rank, self.dtype,
                                           name="to_q_lora")(hidden_states)
            k = k + lora_scale * LoRADelta(inner, self.lora_rank, self.dtype,
                                           name="to_k_lora")(ctx)
            v = v + lora_scale * LoRADelta(inner, self.lora_rank, self.dtype,
                                           name="to_v_lora")(ctx)
        q_tokens, k_tokens = q, k

        B, Lq = q.shape[:2]
        Lk = k.shape[1]
        use_kernel = use_sharded = False
        if FLASH_SPATIAL and bias is None:
            from cvd_tpu.ops.epi_flash import flash_attention, flash_supported

            ok = flash_supported(Lq, Lk, inner, self.heads)
            if SHARD_MESH is not None:
                from cvd_tpu.parallel.shard_ops import flat_batch_axes

                use_sharded = (
                    ok and encoder_hidden_states is None
                    and flat_batch_axes(SHARD_MESH) is not None
                    and B % SHARD_MESH.size == 0
                )
            else:
                use_kernel = ok and jax.default_backend() == "tpu"
        if use_sharded:
            from cvd_tpu.parallel.shard_ops import sharded_spatial_flash

            out = sharded_spatial_flash(q, k, v, self.heads, SHARD_MESH)
        elif use_kernel:
            # fused kernel in the projections' native [B, L, C] layout —
            # no [B,L,H,D]->[B,H,L,D] transpose copies in HBM
            out = flash_attention(q, k, v, heads=self.heads)
        else:
            qh = q.reshape(B, Lq, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            kh = k.reshape(B, Lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            vh = v.reshape(B, Lk, self.heads, self.dim_head).transpose(0, 2, 1, 3)
            if bias is not None and bias.ndim == 3:
                bias = bias[:, None]
            out = scaled_dot_product_attention(qh, kh, vh, bias)
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, inner)
        h = out
        out = nn.Dense(
            self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0"
        )(out)
        if self.lora_rank > 0:
            out = out + lora_scale * LoRADelta(
                self.query_dim, self.lora_rank, self.dtype, name="to_out_lora"
            )(h)
        if return_qk:
            return out, {"query": q_tokens, "key": k_tokens}
        return out


class Conv2d(nn.Module):
    """Thin nn.Conv wrapper with torch-style int stride/padding args."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


def conv_per_frame(conv: nn.Module, x: jnp.ndarray) -> jnp.ndarray:
    """Run a 2D conv on [B, F, H, W, C] by folding frames into batch
    (InflatedConv3d, resnet.py:19-27)."""
    B, F = x.shape[:2]
    out = conv(x.reshape((B * F,) + x.shape[2:]))
    return out.reshape((B, F) + out.shape[1:])


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (default config used by SD1.5):

    norm1 -> silu -> conv1 -> (+ time_emb_proj(silu(temb))) -> norm2 -> silu
    -> conv2 -> + shortcut(1x1 conv when channels change).
    """

    out_channels: int
    temb_channels: int = 1280
    groups: int = 32
    eps: float = 1e-6
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps,
                           dtype=self.dtype, act="silu", name="norm1")(x)
        h = Conv2d(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps,
                           dtype=self.dtype, act="silu", name="norm2")(h)
        h = Conv2d(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = Conv2d(
                self.out_channels, 1, 1, 0, dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return residual + h


class Downsample2D(nn.Module):
    """stride-2 3x3 conv (diffusers Downsample2D with use_conv=True)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv2d(self.out_channels, 3, 2, 1, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """nearest x2 + 3x3 conv (diffusers Upsample2D)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return Conv2d(self.out_channels, 3, 1, 1, dtype=self.dtype, name="conv")(x)


class FusionBlock2D(nn.Module):
    """First-frame feature fusion (reference resnet.py:49-260, behind the
    fuse_first_frame flag): concat(first frame, frame_t) -> 1x1 resnet
    emitting (scale_1, scale_2, shift) with zero-init output, modulating

        out_t = scale_1 * first + (1 + scale_2) * frame_t + shift

    Input  first [B, 1, H, W, C], post [B, F-1, H, W, C], temb [B, Ct];
    returns the fused post frames.
    """

    channels: int
    temb_channels: int = 1280
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, first, post, temb):
        B, Fm1 = post.shape[:2]
        C = self.channels
        rep_first = jnp.broadcast_to(first, post.shape)
        h = jnp.concatenate([rep_first, post], axis=-1)  # [B, F-1, H, W, 2C]
        h = h.reshape((B * Fm1,) + h.shape[2:])
        inp = h
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps,
                           dtype=self.dtype, act="silu", name="norm1")(h)
        h = Conv2d(3 * C, 1, 1, 0, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(3 * C, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(jnp.repeat(temb, Fm1, axis=0))
        )
        h = h + t[:, None, None, :]
        h = FusedGroupNorm(num_groups=self.groups, epsilon=self.eps,
                           dtype=self.dtype, act="silu", name="norm2")(h)
        h = Conv2d(3 * C, 1, 1, 0, dtype=self.dtype, name="conv2")(h)
        short = Conv2d(3 * C, 1, 1, 0, dtype=self.dtype, name="conv_shortcut")(inp)
        h = short + h
        h = nn.Conv(3 * C, (1, 1), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv_out")(h)
        h = h.reshape((B, Fm1) + h.shape[1:])
        scale_1, scale_2, shift = jnp.split(h, 3, axis=-1)
        return scale_1 * rep_first + (1.0 + scale_2) * post + shift


class BasicTransformerBlock(nn.Module):
    """diffusers BasicTransformerBlock (spatial): self attn, cross attn, ff.

    ``extended_attention``: the self-attention's K/V see the token concat of
    both videos in the pair (reference spatial_extended_attention,
    attention_processor.py:69-83) so spatial content syncs across views.
    """

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    extended_attention: bool = False
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: jnp.ndarray, lora_scale: float = 1.0,
        pab=None,
    ) -> jnp.ndarray:
        """pab: optional dict of traced bool scalars keyed by attention
        class ("spatial" for attn1, "cross" for attn2) — see
        pipelines/pab.py."""
        pab_spatial = None if pab is None else pab.get("spatial")
        pab_cross = None if pab is None else pab.get("cross")
        # norms fold into the following projections unless the normalized
        # tokens are needed standalone (pair-concat context, LoRA deltas)
        if self.lora_rank == 0 and not self.extended_attention:
            x = x + Attention(
                self.dim, self.heads, self.dim_head, dtype=self.dtype,
                name="attn1",
            )(x, None, pre_ln=LayerNormParams(self.dim, name="norm1")(),
              pab_reuse=pab_spatial)
            x = x + Attention(
                self.dim, self.heads, self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype, name="attn2",
            )(x, context, pre_ln=LayerNormParams(self.dim, name="norm2")(),
              pab_reuse=pab_cross)
            x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
                x, pre_ln=LayerNormParams(self.dim, name="norm3")()
            )
            return x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        self_ctx = None
        if self.extended_attention:
            half = h.shape[0] // 2
            pair = jnp.concatenate([h[:half], h[half:]], axis=1)  # [B/2, 2L, C]
            self_ctx = jnp.tile(pair, (2, 1, 1))
        x = x + Attention(
            self.dim, self.heads, self.dim_head, lora_rank=self.lora_rank,
            dtype=self.dtype, name="attn1",
        )(h, self_ctx, lora_scale=lora_scale, pab_reuse=pab_spatial)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            lora_rank=self.lora_rank,
            dtype=self.dtype,
            name="attn2",
        )(h, context, lora_scale=lora_scale, pab_reuse=pab_cross)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer (conv projections, SD1.5 use_linear_projection=False).

    Input [N, H, W, C]; context [N, L, C_ctx].
    """

    in_channels: int
    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: int = 768
    extended_attention: bool = False
    lora_rank: int = 0
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: jnp.ndarray, lora_scale: float = 1.0,
        pab=None,
    ) -> jnp.ndarray:
        N, H, W, C = x.shape
        inner = self.heads * self.dim_head
        residual = x
        h = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = Conv2d(inner, 1, 1, 0, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(N, H * W, inner)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                inner,
                self.heads,
                self.dim_head,
                self.cross_attention_dim,
                extended_attention=self.extended_attention,
                lora_rank=self.lora_rank,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context, lora_scale=lora_scale, pab=pab)
        h = h.reshape(N, H, W, inner)
        h = Conv2d(C, 1, 1, 0, dtype=self.dtype, name="proj_out")(h)
        return h + residual
