"""Sparse-frame ControlNet for the video UNet.

Re-design of AnimateDiff's SparseControlNetModel
(``animatediff/models/sparse_controlnet.py:85-589``): a copy of the UNet's
encoder (+ motion modules) that consumes per-frame conditioning images with
a sparsity mask channel and emits zero-initialized residuals for every
down-block state and the mid state. The main UNet already accepts these via
``down_block_additional_residuals`` / ``mid_block_additional_residual``
(cvd_tpu.models.unet, mirroring unet.py:1298-1348).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cvd_tpu.models.layers import (
    Conv2d,
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    sinusoidal_time_embedding,
)
from cvd_tpu.models.motion import TemporalTransformer
from cvd_tpu.models.unet import UNetConfig, _fold, _unfold


class SparseConditioningEmbedding(nn.Module):
    """conv pyramid over the conditioning video (+ mask channel), zero-init
    output conv (sparse_controlnet.py:49-83)."""

    out_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        B = cond.shape[0]
        x = _fold(cond)
        x = Conv2d(self.block_out_channels[0], 3, 1, 1, dtype=self.dtype, name="conv_in")(x)
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            ci, co = self.block_out_channels[i], self.block_out_channels[i + 1]
            x = Conv2d(ci, 3, 1, 1, dtype=self.dtype, name=f"blocks_{2*i}")(x)
            x = nn.silu(x)
            x = Conv2d(co, 3, 2, 1, dtype=self.dtype, name=f"blocks_{2*i+1}")(x)
            x = nn.silu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_out",
        )(x)
        return _unfold(x, B)


class SparseControlNetModel(nn.Module):
    """Encoder-only UNet copy emitting controlnet residuals.

    __call__(sample [B,F,h,w,4], t, text [B,L,C], conditioning
    [B,F,H,W,cond_ch], conditioning_mask [B,F,H,W,1]) ->
    (down_residuals tuple, mid_residual), each scaled by
    ``conditioning_scale``.
    """

    config: UNetConfig
    conditioning_channels: int = 3
    concat_conditioning_mask: bool = True
    set_noisy_sample_input_to_zero: bool = False
    use_motion_modules: bool = True
    # released AnimateDiff SparseCtrl motion modules run ONE Temporal_Self
    # attention per block (sparse_controlnet.py:127-134), unlike the main
    # UNet's two
    motion_attention_blocks: int = 1
    # v3 RGB ckpt layout: a single zero-init conv replaces the conditioning
    # pyramid (sparse_controlnet.py:181-184)
    use_simplified_condition_embedding: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        conditioning: jnp.ndarray,
        conditioning_mask: Optional[jnp.ndarray] = None,
        conditioning_scale: float = 1.0,
    ):
        cfg = self.config
        ch = cfg.block_out_channels
        B, F = sample.shape[:2]
        heads = cfg.attention_heads

        if self.set_noisy_sample_input_to_zero:
            sample = jnp.zeros_like(sample)

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))
        t_emb = sinusoidal_time_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=cfg.dtype, name="time_embedding")(
            t_emb.astype(cfg.dtype)
        )

        if self.concat_conditioning_mask:
            assert conditioning_mask is not None
            conditioning = jnp.concatenate([conditioning, conditioning_mask], axis=-1)

        x = _unfold(
            Conv2d(ch[0], 3, 1, 1, dtype=cfg.dtype, name="conv_in")(_fold(sample)), B
        )
        if self.use_simplified_condition_embedding:
            cond_emb = _unfold(nn.Conv(
                ch[0], (3, 3), padding=[(1, 1), (1, 1)],
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                name="controlnet_cond_embedding",
            )(_fold(conditioning)), B)
        else:
            cond_emb = SparseConditioningEmbedding(
                ch[0], dtype=cfg.dtype, name="controlnet_cond_embedding"
            )(conditioning)
        x = x + cond_emb

        residuals: List[jnp.ndarray] = [x]
        for i in range(len(ch)):
            is_final = i == len(ch) - 1
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    ch[i], temb.shape[-1], cfg.norm_num_groups, dtype=cfg.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(_fold(x), jnp.repeat(temb, F, axis=0))
                if not is_final:
                    h = Transformer2DModel(
                        ch[i], heads, ch[i] // heads,
                        cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups, dtype=cfg.dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, jnp.repeat(encoder_hidden_states, F, axis=0))
                x = _unfold(h, B)
                if self.use_motion_modules:
                    x = TemporalTransformer(
                        ch[i], heads, 1, self.motion_attention_blocks,
                        cfg.motion_pe_max_len, (), 1.0, cfg.motion_norm_groups,
                        zero_initialize=False, dtype=cfg.dtype,
                        name=f"down_blocks_{i}_motion_modules_{j}",
                    )(x, None)
                residuals.append(x)
            if not is_final:
                x = _unfold(
                    Downsample2D(ch[i], dtype=cfg.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(_fold(x)), B
                )
                residuals.append(x)

        # mid
        h = ResnetBlock2D(ch[-1], temb.shape[-1], cfg.norm_num_groups,
                          dtype=cfg.dtype, name="mid_block_resnets_0")(
            _fold(x), jnp.repeat(temb, F, axis=0))
        h = Transformer2DModel(
            ch[-1], heads, ch[-1] // heads,
            cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups, dtype=cfg.dtype, name="mid_block_attentions_0",
        )(h, jnp.repeat(encoder_hidden_states, F, axis=0))
        h = ResnetBlock2D(ch[-1], temb.shape[-1], cfg.norm_num_groups,
                          dtype=cfg.dtype, name="mid_block_resnets_1")(
            h, jnp.repeat(temb, F, axis=0))
        mid = _unfold(h, B)

        # zero-initialized output projections (controlnet zero convs)
        out_res = []
        for idx, r in enumerate(residuals):
            z = nn.Conv(
                r.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=cfg.dtype,
                name=f"controlnet_down_blocks_{idx}",
            )(_fold(r))
            out_res.append(_unfold(z, B) * conditioning_scale)
        zmid = nn.Conv(
            mid.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=cfg.dtype,
            name="controlnet_mid_block",
        )(_fold(mid))
        return tuple(out_res), _unfold(zmid, B) * conditioning_scale
