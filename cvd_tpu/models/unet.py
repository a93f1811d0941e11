"""UNet3DConditionModel — SD1.5 UNet inflated to video, with AnimateDiff
motion modules and CVD epi (cross-video sync) modules.

Re-design of the reference ``animatediff/models/unet.py`` +
``unet_blocks.py``: per UNet layer the op order is

    resnet (per frame) -> spatial transformer (per frame, text cross-attn)
    -> motion module (temporal attn, pose-conditioned) -> epi module
    (cross-video epipolar attn)                      [unet_blocks.py:460-476]

Layout is channels-last video ``[B, F, H, W, C]``; per-frame 2D ops fold
frames into batch. The epi conditioning travels as one
``EpiConditioning`` pytree instead of the reference's
F_mats/H_mats/kv_index side channels threaded through processors.

Block/parameter naming mirrors the reference state-dict structure
(down_blocks_{i}.resnets_{j}...) so checkpoint import is a mechanical rule.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cvd_tpu.models.epi import EpiConditioning, EpiTransformer
from cvd_tpu.models.layers import (FusedGroupNorm, Conv2d,
    Downsample2D,
    FusionBlock2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
    sinusoidal_time_embedding,
)
from cvd_tpu.models.motion import TemporalTransformer


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    # motion modules (configs/inference_config.yaml:8-19)
    use_motion_module: bool = True
    motion_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = False
    motion_num_transformer_blocks: int = 1
    motion_num_attention_blocks: int = 2
    motion_pe_max_len: int = 32
    motion_zero_initialize: bool = False
    # the reference's motion/epi transformers take their GroupNorm group
    # count from motion_module_kwargs/epi_module_kwargs (default 32,
    # motion_module.py:262, epi_module.py:101), NOT from the UNet's
    # norm_num_groups — so they stay at 32 even when the UNet norm differs
    motion_norm_groups: int = 32
    epi_norm_groups: int = 32
    # pose conditioning (configs/inference_config.yaml:48-56)
    pose_cond_attn_indices: Tuple[int, ...] = (0,)
    pose_scale: float = 1.0
    # epi modules (configs/inference_config.yaml:21-32)
    use_epi_module: bool = True
    epi_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    epi_module_mid_block: bool = False
    epi_num_transformer_blocks: int = 1
    epi_num_attention_blocks: int = 2
    epi_zero_initialize: bool = True
    # spatial attention extras (attention_processor.py:69-83, 113-225)
    spatial_extended_attention: bool = False
    # >0: fixed LoRA rank; <0: per-layer rank = channels // (-value)
    # (reference rank rule, unet.py:1028); 0: no LoRA params
    spatial_lora_rank: int = 0
    # first-frame feature fusion (unet.py:107,141-153; off in released configs)
    fuse_first_frame: bool = False
    # auxiliary q/k output channels for the epipolar training loss
    additional_channel: int = 0
    # recompute block activations in the backward pass (jax.checkpoint per
    # UNet block). Full-size training at 16f/256px needs ~19 GB of saved
    # activations without it — over a v5e chip's 16 GB HBM.
    remat: bool = False
    dtype: Any = jnp.float32

    def scaled(self, width_factor: float) -> "UNetConfig":
        """A thinner model for smoke tests: channels scaled, same topology."""
        ch = tuple(max(32, int(c * width_factor) // 32 * 32) for c in self.block_out_channels)
        return dataclasses.replace(self, block_out_channels=ch)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    B, F = x.shape[:2]
    return x.reshape((B * F,) + x.shape[2:])


def _unfold(x: jnp.ndarray, B: int) -> jnp.ndarray:
    return x.reshape((B, -1) + x.shape[1:])


def _lora_rank(cfg: UNetConfig, channels: int) -> int:
    if cfg.spatial_lora_rank > 0:
        return cfg.spatial_lora_rank
    if cfg.spatial_lora_rank < 0:
        return channels // (-cfg.spatial_lora_rank)
    return 0


class CrossAttnDownBlock(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    add_downsample: bool
    use_motion: bool
    use_epi: bool
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, context, pose_feature, epi_cond, lora_scale=1.0):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        context_f = jnp.repeat(context, x.shape[1], axis=0)
        res_states: List[jnp.ndarray] = []
        aux: List[dict] = []
        for j in range(self.num_layers):
            h = _fold(x)
            h = ResnetBlock2D(
                self.out_channels, temb.shape[-1], cfg.norm_num_groups,
                dtype=cfg.dtype, name=f"resnets_{j}",
            )(h, temb_f)
            h = Transformer2DModel(
                self.out_channels, self.heads, self.out_channels // self.heads,
                cross_attention_dim=self.cross_attention_dim,
                extended_attention=cfg.spatial_extended_attention,
                lora_rank=_lora_rank(cfg, self.out_channels),
                groups=cfg.norm_num_groups, dtype=cfg.dtype, name=f"attentions_{j}",
            )(h, context_f, lora_scale=lora_scale)
            x = _unfold(h, B)
            if self.use_motion:
                x = TemporalTransformer(
                    self.out_channels, cfg.attention_heads,
                    cfg.motion_num_transformer_blocks, cfg.motion_num_attention_blocks,
                    cfg.motion_pe_max_len, cfg.pose_cond_attn_indices, cfg.pose_scale,
                    cfg.motion_norm_groups, cfg.motion_zero_initialize,
                    dtype=cfg.dtype, name=f"motion_modules_{j}",
                )(x, pose_feature)
            if self.use_epi:
                x, a = EpiTransformer(
                    self.out_channels, cfg.attention_heads,
                    cfg.epi_num_transformer_blocks, cfg.epi_num_attention_blocks,
                    cfg.epi_norm_groups, cfg.epi_zero_initialize,
                    dtype=cfg.dtype, name=f"epi_modules_{j}",
                )(x, epi_cond)
                aux += a
            res_states.append(x)
        if self.add_downsample:
            x = _unfold(Downsample2D(self.out_channels, dtype=cfg.dtype, name="downsamplers_0")(_fold(x)), B)
            res_states.append(x)
        return x, res_states, aux


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    use_motion: bool
    use_epi: bool
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, pose_feature, epi_cond):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        res_states: List[jnp.ndarray] = []
        aux: List[dict] = []
        for j in range(self.num_layers):
            h = ResnetBlock2D(
                self.out_channels, temb.shape[-1], cfg.norm_num_groups,
                dtype=cfg.dtype, name=f"resnets_{j}",
            )(_fold(x), temb_f)
            x = _unfold(h, B)
            if self.use_motion:
                x = TemporalTransformer(
                    self.out_channels, cfg.attention_heads,
                    cfg.motion_num_transformer_blocks, cfg.motion_num_attention_blocks,
                    cfg.motion_pe_max_len, cfg.pose_cond_attn_indices, cfg.pose_scale,
                    cfg.motion_norm_groups, cfg.motion_zero_initialize,
                    dtype=cfg.dtype, name=f"motion_modules_{j}",
                )(x, pose_feature)
            if self.use_epi:
                x, a = EpiTransformer(
                    self.out_channels, cfg.attention_heads,
                    cfg.epi_num_transformer_blocks, cfg.epi_num_attention_blocks,
                    cfg.epi_norm_groups, cfg.epi_zero_initialize,
                    dtype=cfg.dtype, name=f"epi_modules_{j}",
                )(x, epi_cond)
                aux += a
            res_states.append(x)
        if self.add_downsample:
            x = _unfold(Downsample2D(self.out_channels, dtype=cfg.dtype, name="downsamplers_0")(_fold(x)), B)
            res_states.append(x)
        return x, res_states, aux


class MidBlock(nn.Module):
    channels: int
    heads: int
    cross_attention_dim: int
    use_motion: bool
    use_epi: bool
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, temb, context, pose_feature, epi_cond, lora_scale=1.0):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        context_f = jnp.repeat(context, x.shape[1], axis=0)
        aux: List[dict] = []
        h = ResnetBlock2D(
            self.channels, temb.shape[-1], cfg.norm_num_groups,
            dtype=cfg.dtype, name="resnets_0",
        )(_fold(x), temb_f)
        h = Transformer2DModel(
            self.channels, self.heads, self.channels // self.heads,
            cross_attention_dim=self.cross_attention_dim,
            extended_attention=cfg.spatial_extended_attention,
            lora_rank=_lora_rank(cfg, self.channels),
            groups=cfg.norm_num_groups, dtype=cfg.dtype, name="attentions_0",
        )(h, context_f, lora_scale=lora_scale)
        x = _unfold(h, B)
        if self.use_motion:
            x = TemporalTransformer(
                self.channels, cfg.attention_heads,
                cfg.motion_num_transformer_blocks, cfg.motion_num_attention_blocks,
                cfg.motion_pe_max_len, cfg.pose_cond_attn_indices, cfg.pose_scale,
                cfg.motion_norm_groups, cfg.motion_zero_initialize,
                dtype=cfg.dtype, name="motion_modules_0",
            )(x, pose_feature)
        if self.use_epi:
            x, a = EpiTransformer(
                self.channels, cfg.attention_heads,
                cfg.epi_num_transformer_blocks, cfg.epi_num_attention_blocks,
                cfg.epi_norm_groups, cfg.epi_zero_initialize,
                dtype=cfg.dtype, name="epi_modules_0",
            )(x, epi_cond)
            aux += a
        h = ResnetBlock2D(
            self.channels, temb.shape[-1], cfg.norm_num_groups,
            dtype=cfg.dtype, name="resnets_1",
        )(_fold(x), temb_f)
        return _unfold(h, B), aux


class CrossAttnUpBlock(nn.Module):
    out_channels: int
    prev_output_channel: int
    input_channel: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    add_upsample: bool
    use_motion: bool
    use_epi: bool
    has_attention: bool
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, res_states, temb, context, pose_feature, epi_cond, lora_scale=1.0):
        cfg = self.cfg
        B = x.shape[0]
        temb_f = jnp.repeat(temb, x.shape[1], axis=0)
        context_f = jnp.repeat(context, x.shape[1], axis=0) if context is not None else None
        aux: List[dict] = []
        for j in range(self.num_layers):
            res = res_states[-1 - j]
            x = jnp.concatenate([x, res], axis=-1)
            h = ResnetBlock2D(
                self.out_channels, temb.shape[-1], cfg.norm_num_groups,
                dtype=cfg.dtype, name=f"resnets_{j}",
            )(_fold(x), temb_f)
            if self.has_attention:
                h = Transformer2DModel(
                    self.out_channels, self.heads, self.out_channels // self.heads,
                    cross_attention_dim=self.cross_attention_dim,
                    extended_attention=cfg.spatial_extended_attention,
                    lora_rank=_lora_rank(cfg, self.out_channels),
                    groups=cfg.norm_num_groups, dtype=cfg.dtype, name=f"attentions_{j}",
                )(h, context_f, lora_scale=lora_scale)
            x = _unfold(h, B)
            if self.use_motion:
                x = TemporalTransformer(
                    self.out_channels, cfg.attention_heads,
                    cfg.motion_num_transformer_blocks, cfg.motion_num_attention_blocks,
                    cfg.motion_pe_max_len, cfg.pose_cond_attn_indices, cfg.pose_scale,
                    cfg.motion_norm_groups, cfg.motion_zero_initialize,
                    dtype=cfg.dtype, name=f"motion_modules_{j}",
                )(x, pose_feature)
            if self.use_epi:
                x, a = EpiTransformer(
                    self.out_channels, cfg.attention_heads,
                    cfg.epi_num_transformer_blocks, cfg.epi_num_attention_blocks,
                    cfg.epi_norm_groups, cfg.epi_zero_initialize,
                    dtype=cfg.dtype, name=f"epi_modules_{j}",
                )(x, epi_cond)
                aux += a
        if self.add_upsample:
            x = _unfold(Upsample2D(self.out_channels, dtype=cfg.dtype, name="upsamplers_0")(_fold(x)), B)
        return x, aux


class UNet3DConditionModel(nn.Module):
    """Pose- and epipolar-conditioned video UNet (the reference's
    UNet3DConditionModelPoseCond, unet.py:917-1452)."""

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, H, W, C_in]
        timesteps: jnp.ndarray,  # [] or [B]
        encoder_hidden_states: jnp.ndarray,  # [B, L, cross_dim]
        pose_features: Optional[Sequence[jnp.ndarray]] = None,  # 4x [B,F,h,w,c]
        epi_cond: Optional[EpiConditioning] = None,
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        lora_scale: float = 1.0,
    ):
        cfg = self.config
        B, F = sample.shape[:2]
        ch = cfg.block_out_channels
        heads = cfg.attention_heads

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))
        t_emb = sinusoidal_time_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=cfg.dtype, name="time_embedding")(
            t_emb.astype(cfg.dtype)
        )

        if pose_features is None:
            pose_features = [None] * 4

        # rematerialized block variants for memory-bound training
        DownCls, PlainDownCls, MidCls, UpCls = (
            (nn.remat(CrossAttnDownBlock), nn.remat(DownBlock),
             nn.remat(MidBlock), nn.remat(CrossAttnUpBlock))
            if cfg.remat
            else (CrossAttnDownBlock, DownBlock, MidBlock, CrossAttnUpBlock)
        )

        x = _unfold(
            Conv2d(ch[0], 3, 1, 1, dtype=cfg.dtype, name="conv_in")(_fold(sample)), B
        )
        if cfg.fuse_first_frame:
            fused = FusionBlock2D(ch[0], dtype=cfg.dtype, name="down_fusers_0")(
                x[:, :1], x[:, 1:], temb
            )
            x = jnp.concatenate([x[:, :1], fused], axis=1)

        res_stack: List[jnp.ndarray] = [x]
        aux_all: List[dict] = []

        # down
        for i in range(len(ch)):
            res = 2**i
            is_final = i == len(ch) - 1
            use_motion = cfg.use_motion_module and res in cfg.motion_module_resolutions
            use_epi = cfg.use_epi_module and res in cfg.epi_module_resolutions
            if not is_final:
                x, res_states, aux = DownCls(
                    ch[i], cfg.layers_per_block, heads, cfg.cross_attention_dim,
                    add_downsample=True, use_motion=use_motion, use_epi=use_epi,
                    cfg=cfg, name=f"down_blocks_{i}",
                )(x, temb, encoder_hidden_states, pose_features[i], epi_cond,
                  lora_scale=lora_scale)
            else:
                x, res_states, aux = PlainDownCls(
                    ch[i], cfg.layers_per_block, add_downsample=False,
                    use_motion=use_motion, use_epi=use_epi,
                    cfg=cfg, name=f"down_blocks_{i}",
                )(x, temb, pose_features[i], epi_cond)
            res_stack += res_states
            aux_all += aux

        if down_block_additional_residuals is not None:
            res_stack = [
                r + extra for r, extra in zip(res_stack, down_block_additional_residuals)
            ]

        # mid
        x, aux = MidCls(
            ch[-1], heads, cfg.cross_attention_dim,
            use_motion=cfg.use_motion_module and cfg.motion_module_mid_block,
            use_epi=cfg.use_epi_module and cfg.epi_module_mid_block,
            cfg=cfg, name="mid_block",
        )(x, temb, encoder_hidden_states, pose_features[-1], epi_cond,
          lora_scale=lora_scale)
        aux_all += aux

        if cfg.fuse_first_frame:
            fused = FusionBlock2D(ch[-1], dtype=cfg.dtype, name="mid_fuser")(
                x[:, :1], x[:, 1:], temb
            )
            x = jnp.concatenate([x[:, :1], fused], axis=1)

        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual

        # up
        rev_ch = list(reversed(ch))
        prev_out = rev_ch[0]
        for i in range(len(ch)):
            res = 2 ** (3 - i)
            is_final = i == len(ch) - 1
            use_motion = cfg.use_motion_module and res in cfg.motion_module_resolutions
            use_epi = cfg.use_epi_module and res in cfg.epi_module_resolutions
            out_ch = rev_ch[i]
            in_ch = rev_ch[min(i + 1, len(ch) - 1)]
            n_layers = cfg.layers_per_block + 1
            res_states = res_stack[-n_layers:]
            res_stack = res_stack[:-n_layers]
            x, aux = UpCls(
                out_ch, prev_out, in_ch, n_layers, heads, cfg.cross_attention_dim,
                add_upsample=not is_final, use_motion=use_motion, use_epi=use_epi,
                has_attention=(i != 0),  # up_block 0 is UpBlock3D (no spatial attn)
                cfg=cfg, name=f"up_blocks_{i}",
            )(x, res_states, temb, encoder_hidden_states,
              pose_features[-(i + 1)], epi_cond, lora_scale=lora_scale)
            aux_all += aux
            prev_out = out_ch

        # out: frame-wise GroupNorm (unet.py:1422-1424), silu, conv
        h = FusedGroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=1e-5, dtype=cfg.dtype,
            act="silu", name="conv_norm_out",
        )(_fold(x))
        out = Conv2d(cfg.out_channels, 3, 1, 1, dtype=cfg.dtype, name="conv_out")(h)
        out = _unfold(out, B)

        auxiliary = None
        if cfg.additional_channel > 0 and aux_all:
            # 1x1 convs over the last epi layer's q/k maps (unet.py:1429-1443)
            q, k = aux_all[-1]["query"], aux_all[-1]["key"]
            BF, N, C = q.shape
            s = int(round(N**0.5))
            qm = q.reshape(B, F, s, s, C)
            km = k.reshape(B, F, s, s, C)
            aq = _unfold(Conv2d(cfg.additional_channel, 1, 1, 0, dtype=cfg.dtype,
                                name="conv_auxiliary_query")(_fold(qm)), B)
            ak = _unfold(Conv2d(cfg.additional_channel, 1, 1, 0, dtype=cfg.dtype,
                                name="conv_auxiliary_key")(_fold(km)), B)
            auxiliary = jnp.concatenate([aq, ak], axis=-1)

        return out, {"auxiliary": auxiliary, "epi_qk": aux_all}
