"""Torch oracle of the reference's own modules (exact forward semantics).

Each class reproduces the named reference class's forward math, citing
animatediff file:line. Used only by tests/test_reference_golden.py to
golden-test the Flax modules at random weights. This transcription is
deliberate and test-only: VERDICT round 1 (item #1) prescribed vendoring
a torch-side harness that reproduces the reference modules' forward
exactly, so numerical parity is proven against the reference's own math
rather than hand-written formulas. Nothing here is imported by cvd_tpu.

Randomness control: ``EpiEncoding.get_attn_map`` accepts a
``slope_override`` tensor so tests can pin the random pseudo-line slopes
that the reference draws with ``torch.rand`` (epi_module.py:335); with
``None`` it matches the reference behavior exactly.
"""
from __future__ import annotations

import math
from typing import Optional

import torch
import torch.nn.functional as F
from einops import rearrange, repeat
from torch import nn

from .diffusers_min import (
    Attention,
    BasicTransformerBlock,
    Downsample2D,
    FeedForward,
    LoRALinearLayer,
    ResnetBlock2D,
    Timesteps,
    TimestepEmbedding,
    Transformer2DModel,
    Upsample2D,
)


def zero_module(module):
    # motion_module.py:20-24
    for p in module.parameters():
        p.detach().zero_()
    return module


class InflatedConv3d(nn.Conv2d):
    """resnet.py:19-27 — 2D conv applied per frame of [b c f h w]."""

    def forward(self, x):
        video_length = x.shape[2]
        x = rearrange(x, "b c f h w -> (b f) c h w")
        x = super().forward(x)
        return rearrange(x, "(b f) c h w -> b c f h w", f=video_length)


class InflatedGroupNorm(nn.GroupNorm):
    """resnet.py:30-40 — GroupNorm per frame of [b c f h w]."""

    def forward(self, x):
        video_length = x.shape[2]
        x = rearrange(x, "b c f h w -> (b f) c h w")
        x = super().forward(x)
        return rearrange(x, "(b f) c h w -> b c f h w", f=video_length)


class PositionalEncoding(nn.Module):
    """motion_module.py:463-481 — interleaved sin/cos over the frame axis."""

    def __init__(self, d_model, dropout=0.0, max_len=32):
        super().__init__()
        self.dropout = nn.Dropout(p=dropout)
        position = torch.arange(max_len).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model)
        )
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return self.dropout(x + self.pe[:, : x.size(1)])


class AttnProcessor:
    """attention_processor.py:17-110 — SDPA processor with the optional
    cross-video spatial_extended_attention K/V concat (L69-83)."""

    def __init__(self, attn_type=None, spatial_extended_attention=False):
        self.attn_type = attn_type
        self.spatial_extended_attention = spatial_extended_attention

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None, scale=1.0, pose_feature=None):
        residual = hidden_states
        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape
        )
        attention_mask = attn.prepare_attention_mask(
            attention_mask, sequence_length, batch_size
        )
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads

        if self.spatial_extended_attention and self.attn_type == "spatial" \
                and key.shape[1] != 77:
            if key.shape[0] > 32:
                bs = key.shape[0] // 32
                key = torch.cat(key.chunk(bs), dim=1).repeat(bs, 1, 1)
                value = torch.cat(value.chunk(bs), dim=1).repeat(bs, 1, 1)
            else:
                k0, k1 = key.chunk(2)
                key = torch.cat([k0, k1], dim=1).repeat(2, 1, 1)
                v0, v1 = value.chunk(2)
                value = torch.cat([v0, v1], dim=1).repeat(2, 1, 1)

        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False,
        )
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim
        ).to(query.dtype)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if attn.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / attn.rescale_output_factor


class LoRAAttnProcessor(nn.Module):
    """attention_processor.py:113-225 — q/k/v/out LoRA deltas scaled by
    lora_scale, plus the spatial_extended_attention concat."""

    def __init__(self, hidden_size=None, cross_attention_dim=None, rank=4,
                 network_alpha=None, lora_scale=1.0,
                 spatial_extended_attention=False):
        super().__init__()
        self.rank = rank
        self.lora_scale = lora_scale
        self.spatial_extended_attention = spatial_extended_attention
        self.to_q_lora = LoRALinearLayer(hidden_size, hidden_size, rank, network_alpha)
        self.to_k_lora = LoRALinearLayer(cross_attention_dim or hidden_size,
                                         hidden_size, rank, network_alpha)
        self.to_v_lora = LoRALinearLayer(cross_attention_dim or hidden_size,
                                         hidden_size, rank, network_alpha)
        self.to_out_lora = LoRALinearLayer(hidden_size, hidden_size, rank, network_alpha)

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None, pose_feature=None, scale=None):
        lora_scale = self.lora_scale if scale is None else scale
        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape
        )
        attention_mask = attn.prepare_attention_mask(
            attention_mask, sequence_length, batch_size
        )
        query = attn.to_q(hidden_states) + lora_scale * self.to_q_lora(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states) + \
            lora_scale * self.to_k_lora(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states) + \
            lora_scale * self.to_v_lora(encoder_hidden_states)

        if self.spatial_extended_attention and key.shape[1] != 77:
            if key.shape[0] > 32:
                bs = key.shape[0] // 32
                key = torch.cat(key.chunk(bs), dim=1).repeat(bs, 1, 1)
                value = torch.cat(value.chunk(bs), dim=1).repeat(bs, 1, 1)
            else:
                k0, k1 = key.chunk(2)
                key = torch.cat([k0, k1], dim=1).repeat(2, 1, 1)
                v0, v1 = value.chunk(2)
                value = torch.cat([v0, v1], dim=1).repeat(2, 1, 1)

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False,
        )
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim
        ).to(query.dtype)
        h = hidden_states
        hidden_states = attn.to_out[0](hidden_states) + \
            lora_scale * self.to_out_lora(h)
        hidden_states = attn.to_out[1](hidden_states)
        return hidden_states / attn.rescale_output_factor


class PoseAdaptorAttnProcessor(nn.Module):
    """attention_processor.py:228-371 — zero-init qkv_merge mixing the pose
    feature into the q/kv source: h' = qkv_merge(h + pose)*scale + h."""

    def __init__(self, hidden_size, pose_feature_dim=None,
                 cross_attention_dim=None, query_condition=False,
                 key_value_condition=False, scale=1.0,
                 sync_lora_rank=0, network_alpha=None, sync_lora_scale=0):
        super().__init__()
        assert hidden_size == pose_feature_dim
        self.scale = scale
        self.query_condition = query_condition
        self.key_value_condition = key_value_condition
        if query_condition and key_value_condition:
            self.qkv_merge = nn.Linear(hidden_size, hidden_size)
            nn.init.zeros_(self.qkv_merge.weight)
            nn.init.zeros_(self.qkv_merge.bias)
        elif query_condition:
            self.q_merge = nn.Linear(hidden_size, hidden_size)
            nn.init.zeros_(self.q_merge.weight)
            nn.init.zeros_(self.q_merge.bias)
        else:
            self.kv_merge = nn.Linear(hidden_size, hidden_size)
            nn.init.zeros_(self.kv_merge.weight)
            nn.init.zeros_(self.kv_merge.bias)
        # sync lora (attention_processor.py:261-270): active iff rank and
        # scale are both nonzero; LoRA deltas on q/k/v from the merged
        # hidden states and on the post-projection output (:341-344)
        from .diffusers_min import LoRALinearLayer

        self.sync_lora = False
        if not (sync_lora_rank == 0 or sync_lora_scale == 0):
            self.sync_lora = True
            self.sync_lora_rank = sync_lora_rank
            self.sync_lora_scale = sync_lora_scale
            self.to_q_lora_sync = LoRALinearLayer(
                hidden_size, hidden_size, sync_lora_rank, network_alpha)
            self.to_k_lora_sync = LoRALinearLayer(
                cross_attention_dim or hidden_size, hidden_size,
                sync_lora_rank, network_alpha)
            self.to_v_lora_sync = LoRALinearLayer(
                cross_attention_dim or hidden_size, hidden_size,
                sync_lora_rank, network_alpha)
            self.to_out_lora_sync = LoRALinearLayer(
                hidden_size, hidden_size, sync_lora_rank, network_alpha)

    def forward(self, attn, hidden_states, pose_feature,
                encoder_hidden_states=None, attention_mask=None, temb=None,
                scale=None):
        pose_embedding_scale = scale or self.scale
        if self.query_condition and self.key_value_condition:
            assert encoder_hidden_states is None
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        assert hidden_states.ndim == 3 and encoder_hidden_states.ndim == 3
        batch_size, ehs_sequence_length, _ = encoder_hidden_states.shape
        attention_mask = attn.prepare_attention_mask(
            attention_mask, ehs_sequence_length, batch_size
        )
        if pose_feature is not None:
            assert pose_feature.ndim == 3
            if self.query_condition and self.key_value_condition:
                query_hidden_state = self.qkv_merge(
                    hidden_states + pose_feature
                ) * pose_embedding_scale + hidden_states
                key_value_hidden_state = query_hidden_state
            elif self.query_condition:
                query_hidden_state = self.q_merge(
                    hidden_states + pose_feature
                ) * pose_embedding_scale + hidden_states
                key_value_hidden_state = encoder_hidden_states
            else:
                key_value_hidden_state = self.kv_merge(
                    encoder_hidden_states + pose_feature
                ) * pose_embedding_scale + encoder_hidden_states
                query_hidden_state = hidden_states
        else:
            query_hidden_state = hidden_states
            key_value_hidden_state = encoder_hidden_states

        query = attn.to_q(query_hidden_state)
        key = attn.to_k(key_value_hidden_state)
        value = attn.to_v(key_value_hidden_state)
        if self.sync_lora:  # attention_processor.py:345-348
            query = query + self.sync_lora_scale * self.to_q_lora_sync(query_hidden_state)
            key = key + self.sync_lora_scale * self.to_k_lora_sync(key_value_hidden_state)
            value = value + self.sync_lora_scale * self.to_v_lora_sync(key_value_hidden_state)
        query = attn.head_to_batch_dim(query)
        key = attn.head_to_batch_dim(key)
        value = attn.head_to_batch_dim(value)
        attention_probs = attn.get_attention_scores(query, key, attention_mask)
        hidden_states = torch.bmm(attention_probs, value)
        hidden_states = attn.batch_to_head_dim(hidden_states)
        hidden_states = attn.to_out[0](hidden_states)
        if self.sync_lora:  # out-LoRA from the POST-projection output (:341-344)
            hidden_states = hidden_states + \
                self.sync_lora_scale * self.to_out_lora_sync(hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if attn.residual_connection:
            hidden_states = hidden_states + hidden_states
        return hidden_states / attn.rescale_output_factor


class TemporalSelfAttention(Attention):
    """motion_module.py:484-550 — PE on the (b h w) f c tokens, then the
    processor (PoseAdaptor or plain) with encoder_hidden_states=None."""

    def __init__(self, attention_mode=None, temporal_position_encoding=False,
                 temporal_position_encoding_max_len=32,
                 rescale_output_factor=1.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert attention_mode == "Temporal_Self"
        self.pos_encoder = (
            PositionalEncoding(kwargs["query_dim"],
                               max_len=temporal_position_encoding_max_len)
            if temporal_position_encoding else None
        )
        self.rescale_output_factor = rescale_output_factor

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        if self.pos_encoder is not None:
            hidden_states = self.pos_encoder(hidden_states)
        if cross_attention_kwargs.get("pose_feature") is not None:
            pose_feature = cross_attention_kwargs["pose_feature"]
            if pose_feature.ndim == 5:
                pose_feature = rearrange(pose_feature, "b c f h w -> (b h w) f c")
            else:
                assert pose_feature.ndim == 3
            cross_attention_kwargs["pose_feature"] = pose_feature
        if isinstance(self.processor, PoseAdaptorAttnProcessor):
            return self.processor(
                self, hidden_states,
                cross_attention_kwargs.pop("pose_feature"),
                encoder_hidden_states=None, attention_mask=attention_mask,
                **cross_attention_kwargs,
            )
        return self.processor(
            self, hidden_states, encoder_hidden_states=None,
            attention_mask=attention_mask, **cross_attention_kwargs,
        )


class TemporalTransformerBlock(nn.Module):
    """motion_module.py:397-460."""

    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 attention_block_types=("Temporal_Self", "Temporal_Self"),
                 cross_attention_dim=768, temporal_position_encoding=False,
                 temporal_position_encoding_max_len=32, dropout=0.0,
                 rescale_output_factor=1.0, **_):
        super().__init__()
        self.attention_block_types = attention_block_types
        blocks, norms = [], []
        for block_name in attention_block_types:
            blocks.append(TemporalSelfAttention(
                attention_mode=block_name, cross_attention_dim=None,
                query_dim=dim, heads=num_attention_heads,
                dim_head=attention_head_dim, dropout=dropout, bias=False,
                temporal_position_encoding=temporal_position_encoding,
                temporal_position_encoding_max_len=temporal_position_encoding_max_len,
                rescale_output_factor=rescale_output_factor,
            ))
            norms.append(nn.LayerNorm(dim))
        self.attention_blocks = nn.ModuleList(blocks)
        self.norms = nn.ModuleList(norms)
        self.ff = FeedForward(dim, dropout=dropout)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, cross_attention_kwargs=None):
        cross_attention_kwargs = dict(cross_attention_kwargs or {})
        for attention_block, norm, block_type in zip(
                self.attention_blocks, self.norms, self.attention_block_types):
            norm_hidden_states = norm(hidden_states)
            hidden_states = attention_block(
                norm_hidden_states,
                encoder_hidden_states=(norm_hidden_states
                                       if block_type == "Temporal_Self"
                                       else encoder_hidden_states),
                attention_mask=attention_mask,
                **dict(cross_attention_kwargs),
            ) + hidden_states
        hidden_states = self.ff(self.ff_norm(hidden_states)) + hidden_states
        return hidden_states


class TemporalTransformer3DModel(nn.Module):
    """motion_module.py:253-394 (causal-mask machinery omitted: released
    config uses causal_temporal_attention=False)."""

    def __init__(self, in_channels, num_attention_heads, attention_head_dim,
                 num_layers,
                 attention_block_types=("Temporal_Self", "Temporal_Self"),
                 norm_num_groups=32, cross_attention_dim=768,
                 temporal_position_encoding=False,
                 temporal_position_encoding_max_len=32):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.norm = InflatedGroupNorm(norm_num_groups, in_channels, eps=1e-6,
                                      affine=True)
        self.proj_in = nn.Linear(in_channels, inner_dim)
        self.transformer_blocks = nn.ModuleList([
            TemporalTransformerBlock(
                dim=inner_dim, num_attention_heads=num_attention_heads,
                attention_head_dim=attention_head_dim,
                attention_block_types=attention_block_types,
                cross_attention_dim=cross_attention_dim,
                temporal_position_encoding=temporal_position_encoding,
                temporal_position_encoding_max_len=temporal_position_encoding_max_len,
            )
            for _ in range(num_layers)
        ])
        self.proj_out = nn.Linear(inner_dim, in_channels)

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, cross_attention_kwargs=None):
        residual = hidden_states
        height, width = hidden_states.shape[-2:]
        hidden_states = self.norm(hidden_states)
        hidden_states = rearrange(hidden_states, "b c f h w -> (b h w) f c")
        hidden_states = self.proj_in(hidden_states)
        for block in self.transformer_blocks:
            hidden_states = block(hidden_states,
                                  encoder_hidden_states=encoder_hidden_states,
                                  attention_mask=attention_mask,
                                  cross_attention_kwargs=cross_attention_kwargs)
        hidden_states = self.proj_out(hidden_states)
        hidden_states = rearrange(hidden_states, "(b h w) f c -> b c f h w",
                                  h=height, w=width)
        return hidden_states + residual


class VanillaTemporalModule(nn.Module):
    """motion_module.py:204-250."""

    def __init__(self, in_channels, num_attention_heads=8,
                 num_transformer_block=2,
                 attention_block_types=("Temporal_Self",),
                 temporal_position_encoding=True,
                 temporal_position_encoding_max_len=32,
                 temporal_attention_dim_div=1, cross_attention_dim=320,
                 zero_initialize=True):
        super().__init__()
        self.temporal_transformer = TemporalTransformer3DModel(
            in_channels=in_channels,
            num_attention_heads=num_attention_heads,
            attention_head_dim=in_channels // num_attention_heads
            // temporal_attention_dim_div,
            num_layers=num_transformer_block,
            attention_block_types=attention_block_types,
            cross_attention_dim=cross_attention_dim,
            temporal_position_encoding=temporal_position_encoding,
            temporal_position_encoding_max_len=temporal_position_encoding_max_len,
        )
        if zero_initialize:
            self.temporal_transformer.proj_out = zero_module(
                self.temporal_transformer.proj_out
            )

    def forward(self, hidden_states, temb=None, encoder_hidden_states=None,
                attention_mask=None, cross_attention_kwargs=None):
        return self.temporal_transformer(
            hidden_states, encoder_hidden_states, attention_mask,
            cross_attention_kwargs=cross_attention_kwargs,
        )


class EpiEncoding(nn.Module):
    """epi_module.py:271-346 — soft epipolar attention bias.

    ``slope_override``: optional [batch] tensor replacing the torch.rand
    slope draw (for deterministic parity tests); None = reference behavior.
    """

    def __init__(self, d_model, dropout=0.0, max_feat_size=128,
                 F_mat_size=256, rand_slope_on_first_frame=False):
        super().__init__()
        self.F_mat_size = F_mat_size
        self.rand_slope_on_first_frame = rand_slope_on_first_frame
        coords = torch.arange(max_feat_size)
        coords_x, coords_y = torch.meshgrid(coords, coords, indexing="xy")
        coords = torch.stack([coords_x, coords_y, coords_x * 0 + 1], dim=-1)
        self.register_buffer("coords", coords)

    def get_pseudo_F_coords(self, coords, random_slope=False,
                            slope_override=None):
        feat_size = int(coords.shape[1] ** 0.5)
        batch_size = coords.shape[0]
        if random_slope:
            if slope_override is not None:
                slope = slope_override.to(coords.device)
            else:
                slope = torch.rand([batch_size], device=coords.device) * math.pi
            a = torch.cos(slope)[:, None, None].repeat(1, feat_size ** 2, 1)
            b = torch.sin(slope)[:, None, None].repeat(1, feat_size ** 2, 1)
            c = -(a * coords[..., 0:1] + b * coords[..., 1:2])
        else:
            a = torch.zeros([1, feat_size ** 2, 1]).repeat(batch_size, 1, 1)
            b = -torch.ones([1, feat_size ** 2, 1]).repeat(batch_size, 1, 1)
            c = coords[..., 1:2]
        return torch.cat([a, b, c], dim=-1)

    def get_attn_map(self, x, F_mats=None, H_mats=None, pixel_band=3,
                     decay_alpha=3, slope_override=None):
        feat_size = int(x.shape[1] ** 0.5)
        selected = self.coords[:feat_size, :feat_size].reshape(-1, 3)
        coords = ((self.F_mat_size / feat_size) * selected
                  + (self.F_mat_size / feat_size - 1) / 2)[None]
        coords[..., -1] = 1

        if H_mats is not None:
            batch_size = H_mats.shape[0]
            H_coords = coords.repeat(batch_size, 1, 1)
            H_coords[..., :2] = H_coords[..., :2] - (self.F_mat_size - 1) / 2
            H_coords = torch.bmm(
                H_mats.float(), H_coords.permute(0, 2, 1)
            ).permute(0, 2, 1)
            H_coords = H_coords / (H_coords[..., 2:] + 1e-6)
            H_coords[..., :2] = H_coords[..., :2] + (self.F_mat_size - 1) / 2
            F_coords = self.get_pseudo_F_coords(
                H_coords, random_slope=True, slope_override=slope_override
            )
        elif F_mats is not None:
            batch_size = F_mats.shape[0]
            F_coords = coords.repeat(batch_size, 1, 1)
            F_coords = torch.bmm(
                F_mats.float(), F_coords.float().permute(0, 2, 1)
            ).permute(0, 2, 1)
            F_coords[::16] = self.get_pseudo_F_coords(
                coords[::16], random_slope=self.rand_slope_on_first_frame,
                slope_override=slope_override,
            )
        else:
            batch_size = x.shape[0]
            F_coords = self.get_pseudo_F_coords(
                coords.repeat(batch_size, 1, 1), random_slope=True,
                slope_override=slope_override,
            )

        ab_norm = (F_coords[:, :, :2] * F_coords[:, :, :2]).sum(-1).sqrt()[:, :, None]
        cFc = torch.bmm(
            F_coords, coords.repeat(batch_size, 1, 1).permute(0, 2, 1)
        ).abs()
        cFc = cFc / (ab_norm + 1e-6)
        normed_pixel_band = (
            pixel_band / (self.F_mat_size // 2)
            * cFc.reshape(cFc.shape[0], -1).max(dim=-1)[0]
        )[:, None, None]
        map_weight_decay = decay_alpha / (normed_pixel_band + 1e-6)
        attn_mask = -(cFc - normed_pixel_band).clip(0) * map_weight_decay
        return attn_mask.detach()


class EpiAttnProcessor(nn.Module):
    """attention_processor.py:522-650 — cross-video attention: K/V from the
    partner video (chunk-swap or kv_index gather with multi-pair groups),
    epipolar bias as the SDPA mask, first-frame value averaging, and
    {"query","key"} aux output."""

    def __init__(self, hidden_size, scale=1.0):
        super().__init__()
        self.hidden_size = hidden_size
        self.scale = scale

    def forward(self, attn, hidden_states, encoder_hidden_states=None,
                attention_mask=None, kv_index=None, temb=None, scale=None,
                mono_direction=False, fix_firstframe=False, **useless_kwargs):
        assert hidden_states.ndim == 3  # BF x HW x C
        if encoder_hidden_states is None:
            if kv_index is None:
                split = hidden_states.chunk(2)
                encoder_hidden_states = torch.cat([split[1], split[0]], dim=0)
            else:
                encoder_hidden_states = hidden_states[kv_index]
                if kv_index.shape[0] != hidden_states.shape[0]:
                    assert kv_index.shape[0] % hidden_states.shape[0] == 0
                    B, N, C = hidden_states.shape
                    encoder_hidden_states = encoder_hidden_states.reshape(-1, B, N, C)
                    encoder_hidden_states = encoder_hidden_states.permute(
                        1, 2, 0, 3
                    ).reshape(B, -1, C)

        batch_size, ehs_sequence_length, _ = encoder_hidden_states.shape
        attention_mask = attn.prepare_attention_mask(
            attention_mask, ehs_sequence_length, batch_size
        )
        attention_mask = (
            attention_mask.view(batch_size, attn.heads, -1,
                                attention_mask.shape[-1])
            if attention_mask is not None else None
        )

        if mono_direction or fix_firstframe:
            value_self = attn.to_v(hidden_states)
        query = attn.to_q(hidden_states)
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        query_origin, key_origin = query, key

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        if mono_direction or fix_firstframe:
            value_self = value_self.view(
                batch_size, -1, attn.heads, head_dim
            ).transpose(1, 2)

        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask, dropout_p=0.0,
            is_causal=False,
        )

        if mono_direction:
            raise ValueError("kv_index may have bug here. Not supported")
        if fix_firstframe:
            value_reshaped = rearrange(value_self,
                                       "(b t f) n h c -> b t f n h c", t=2, f=16)
            bs = value_reshaped.shape[0]
            ff = value_reshaped[:, :, 0:1].mean(dim=0, keepdim=True).repeat(
                bs, 1, 1, 1, 1, 1
            )
            value_reshaped = rearrange(ff, "b t f n h c -> (b t f) n h c")
            hidden_states[::16] = value_reshaped

        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, inner_dim
        ).to(query.dtype)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if attn.residual_connection:
            hidden_states = hidden_states + hidden_states
        hidden_states = hidden_states / attn.rescale_output_factor
        return hidden_states, {"query": query_origin, "key": key_origin}


class EpiSelfAttention(Attention):
    """epi_module.py:350-462 (the bs>200 / kv>2048 chunking fallback is a
    memory workaround with identical math; not needed at oracle sizes)."""

    def __init__(self, attention_mode=None, epi_position_encoding=False,
                 epi_position_encoding_feat_max_size=32,
                 epi_position_encoding_F_mat_size=256,
                 epi_no_attention_mask=False, epi_mono_direction=False,
                 epi_fix_firstframe=False, epi_rand_slope_ff=False,
                 rescale_output_factor=1.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        assert attention_mode == "Epi_Self"
        self.pos_encoder = (
            EpiEncoding(kwargs["query_dim"], dropout=0.0,
                        max_feat_size=epi_position_encoding_feat_max_size,
                        F_mat_size=epi_position_encoding_F_mat_size,
                        rand_slope_on_first_frame=epi_rand_slope_ff)
            if epi_position_encoding else None
        )
        self.rescale_output_factor = rescale_output_factor
        self.epi_no_attention_mask = epi_no_attention_mask
        self.epi_mono_direction = epi_mono_direction
        self.epi_fix_firstframe = epi_fix_firstframe
        self.slope_override = None  # test hook, threaded to get_attn_map

    def forward(self, hidden_states, F_mats=None, H_mats=None,
                encoder_hidden_states=None, attention_mask=None,
                **cross_attention_kwargs):
        if self.pos_encoder is not None and not self.epi_no_attention_mask:
            with torch.no_grad():
                attention_mask = self.pos_encoder.get_attn_map(
                    hidden_states,
                    F_mats=F_mats[0] if isinstance(F_mats, list) else F_mats,
                    H_mats=H_mats, slope_override=self.slope_override,
                )
                if attention_mask.shape[0] != hidden_states.shape[0]:
                    assert attention_mask.shape[0] % hidden_states.shape[0] == 0
                    B, N, C = hidden_states.shape
                    attention_mask = attention_mask.reshape(-1, B, N, N)
                    attention_mask = attention_mask.permute(1, 2, 3, 0).reshape(B, N, -1)
            torch.nan_to_num(attention_mask, nan=0.0, posinf=0.0, neginf=0.0,
                             out=attention_mask)
        return self.processor(
            self, hidden_states, encoder_hidden_states=None,
            attention_mask=attention_mask,
            kv_index=F_mats[1] if isinstance(F_mats, list) else None,
            mono_direction=self.epi_mono_direction,
            fix_firstframe=self.epi_fix_firstframe,
            **cross_attention_kwargs,
        )


class EpiTransformerBlock(nn.Module):
    """epi_module.py:191-269."""

    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 attention_block_types=("Epi_Self",), cross_attention_dim=768,
                 epi_position_encoding=False,
                 epi_position_encoding_feat_max_size=32,
                 epi_position_encoding_F_mat_size=256,
                 epi_no_attention_mask=False, epi_mono_direction=False,
                 epi_fix_firstframe=False, epi_rand_slope_ff=False, **_):
        super().__init__()
        self.attention_block_types = attention_block_types
        blocks, norms = [], []
        for block_name in attention_block_types:
            blocks.append(EpiSelfAttention(
                attention_mode=block_name, cross_attention_dim=None,
                query_dim=dim, heads=num_attention_heads,
                dim_head=attention_head_dim, bias=False,
                epi_position_encoding=epi_position_encoding,
                epi_position_encoding_feat_max_size=epi_position_encoding_feat_max_size,
                epi_position_encoding_F_mat_size=epi_position_encoding_F_mat_size,
                epi_no_attention_mask=epi_no_attention_mask,
                epi_mono_direction=epi_mono_direction,
                epi_fix_firstframe=epi_fix_firstframe,
                epi_rand_slope_ff=epi_rand_slope_ff,
            ))
            norms.append(nn.LayerNorm(dim))
        self.attention_blocks = nn.ModuleList(blocks)
        self.norms = nn.ModuleList(norms)
        self.ff = FeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, hidden_states, F_mats=None, H_mats=None,
                encoder_hidden_states=None, attention_mask=None,
                cross_attention_kwargs=None):
        additional_outputs = []
        for attention_block, norm, block_type in zip(
                self.attention_blocks, self.norms, self.attention_block_types):
            norm_hidden_states = norm(hidden_states)
            res, aux = attention_block(
                norm_hidden_states, F_mats=F_mats, H_mats=H_mats,
                encoder_hidden_states=(norm_hidden_states
                                       if block_type == "Temporal_Self" else
                                       encoder_hidden_states),
                attention_mask=attention_mask,
                **(cross_attention_kwargs or {}),
            )
            hidden_states = hidden_states + res
            additional_outputs.append(aux)
        hidden_states = self.ff(self.ff_norm(hidden_states)) + hidden_states
        return hidden_states, additional_outputs


class EpiTransformer3DModel(nn.Module):
    """epi_module.py:92-188."""

    def __init__(self, in_channels, num_attention_heads, attention_head_dim,
                 num_layers, attention_block_types=("Epi_Self",),
                 norm_num_groups=32, cross_attention_dim=768, **epi_kwargs):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.norm = InflatedGroupNorm(norm_num_groups, in_channels, eps=1e-6,
                                      affine=True)
        self.proj_in = nn.Linear(in_channels, inner_dim)
        self.transformer_blocks = nn.ModuleList([
            EpiTransformerBlock(
                dim=inner_dim, num_attention_heads=num_attention_heads,
                attention_head_dim=attention_head_dim,
                attention_block_types=attention_block_types,
                cross_attention_dim=cross_attention_dim, **epi_kwargs,
            )
            for _ in range(num_layers)
        ])
        self.proj_out = nn.Linear(inner_dim, in_channels)

    def forward(self, hidden_states, F_mats=None, H_mats=None,
                encoder_hidden_states=None, attention_mask=None,
                cross_attention_kwargs=None):
        residual = hidden_states
        video_length, height, width = hidden_states.shape[-3:]
        hidden_states = self.norm(hidden_states)
        hidden_states = rearrange(hidden_states, "b c f h w -> (b f) (h w) c")
        if F_mats is not None:
            if isinstance(F_mats, torch.Tensor):
                F_mats = rearrange(F_mats, "b f h w -> (b f) h w")
            else:
                F_mats = [rearrange(F_mats[0], "b f h w -> (b f) h w"), F_mats[1]]
        if H_mats is not None:
            H_mats = rearrange(H_mats, "b f h w -> (b f) h w")
        hidden_states = self.proj_in(hidden_states)
        additional_outputs = []
        for block in self.transformer_blocks:
            hidden_states, aux = block(
                hidden_states, F_mats, H_mats,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                cross_attention_kwargs=cross_attention_kwargs,
            )
            additional_outputs += aux
        hidden_states = self.proj_out(hidden_states)
        hidden_states = rearrange(hidden_states, "(b f) (h w) c -> b c f h w",
                                  f=video_length, h=height, w=width)
        return hidden_states + residual, additional_outputs


class EpiModule(nn.Module):
    """epi_module.py:38-89."""

    def __init__(self, in_channels, num_attention_heads=8,
                 num_transformer_block=2, attention_block_types=("Epi_Self",),
                 epi_position_encoding=True,
                 epi_position_encoding_feat_max_size=64,
                 epi_position_encoding_F_mat_size=256,
                 epi_no_attention_mask=False, epi_mono_direction=False,
                 epi_fix_firstframe=False, epi_rand_slope_ff=False,
                 cross_attention_dim=320, zero_initialize=True):
        super().__init__()
        self.epi_transformer = EpiTransformer3DModel(
            in_channels=in_channels,
            num_attention_heads=num_attention_heads,
            attention_head_dim=in_channels // num_attention_heads,
            num_layers=num_transformer_block,
            attention_block_types=attention_block_types,
            cross_attention_dim=cross_attention_dim,
            epi_position_encoding=epi_position_encoding,
            epi_position_encoding_feat_max_size=epi_position_encoding_feat_max_size,
            epi_position_encoding_F_mat_size=epi_position_encoding_F_mat_size,
            epi_no_attention_mask=epi_no_attention_mask,
            epi_mono_direction=epi_mono_direction,
            epi_fix_firstframe=epi_fix_firstframe,
            epi_rand_slope_ff=epi_rand_slope_ff,
        )
        if zero_initialize:
            self.epi_transformer.proj_out = zero_module(
                self.epi_transformer.proj_out
            )

    def forward(self, hidden_states, F_mats=None, H_mats=None, temb=None,
                encoder_hidden_states=None, attention_mask=None,
                cross_attention_kwargs=None):
        return self.epi_transformer(
            hidden_states, F_mats, H_mats, encoder_hidden_states,
            attention_mask, cross_attention_kwargs=cross_attention_kwargs,
        )


class PoseDownsample(nn.Module):
    """pose_adaptor.py:107-131 with use_conv=False — 2x2 avg pool."""

    def forward(self, x):
        return F.avg_pool2d(x, kernel_size=2, stride=2)


class PoseResnetBlock(nn.Module):
    """pose_adaptor.py:134-167 with the released config ksize=1, sk=True,
    use_conv=False."""

    def __init__(self, in_c, out_c, down, ksize=1, sk=True, use_conv=False):
        super().__init__()
        assert sk and not use_conv
        ps = ksize // 2
        self.in_conv = (
            nn.Conv2d(in_c, out_c, ksize, 1, ps) if in_c != out_c else None
        )
        self.block1 = nn.Conv2d(out_c, out_c, 3, 1, 1)
        self.act = nn.ReLU()
        self.block2 = nn.Conv2d(out_c, out_c, ksize, 1, ps)
        self.down = down
        if down:
            self.down_opt = PoseDownsample()

    def forward(self, x):
        if self.down:
            x = self.down_opt(x)
        if self.in_conv is not None:
            x = self.in_conv(x)
        h = self.block2(self.act(self.block1(x)))
        return h + x


class CameraPoseEncoder(nn.Module):
    """pose_adaptor.py:248-329."""

    def __init__(self, downscale_factor, channels=(320, 640, 1280, 1280),
                 nums_rb=2, cin=384, ksize=1, sk=True, use_conv=False,
                 compression_factor=1, temporal_attention_nhead=8,
                 attention_block_types=("Temporal_Self",),
                 temporal_position_encoding=True,
                 temporal_position_encoding_max_len=16):
        super().__init__()
        self.unshuffle = nn.PixelUnshuffle(downscale_factor)
        self.encoder_down_conv_blocks = nn.ModuleList()
        self.encoder_down_attention_blocks = nn.ModuleList()
        for i in range(len(channels)):
            conv_layers = nn.ModuleList()
            attn_layers = nn.ModuleList()
            for j in range(nums_rb):
                if j == 0 and i != 0:
                    in_dim, out_dim = channels[i - 1], int(channels[i] / compression_factor)
                    conv = PoseResnetBlock(in_dim, out_dim, down=True,
                                           ksize=ksize, sk=sk, use_conv=use_conv)
                elif j == 0:
                    in_dim, out_dim = channels[0], int(channels[i] / compression_factor)
                    conv = PoseResnetBlock(in_dim, out_dim, down=False,
                                           ksize=ksize, sk=sk, use_conv=use_conv)
                elif j == nums_rb - 1:
                    in_dim, out_dim = int(channels[i] / compression_factor), channels[i]
                    conv = PoseResnetBlock(in_dim, out_dim, down=False,
                                           ksize=ksize, sk=sk, use_conv=use_conv)
                else:
                    in_dim = out_dim = int(channels[i] / compression_factor)
                    conv = PoseResnetBlock(in_dim, out_dim, down=False,
                                           ksize=ksize, sk=sk, use_conv=use_conv)
                attn = TemporalTransformerBlock(
                    dim=out_dim,
                    num_attention_heads=temporal_attention_nhead,
                    attention_head_dim=int(out_dim / temporal_attention_nhead),
                    attention_block_types=attention_block_types,
                    dropout=0.0, cross_attention_dim=None,
                    temporal_position_encoding=temporal_position_encoding,
                    temporal_position_encoding_max_len=temporal_position_encoding_max_len,
                )
                conv_layers.append(conv)
                attn_layers.append(attn)
            self.encoder_down_conv_blocks.append(conv_layers)
            self.encoder_down_attention_blocks.append(attn_layers)
        self.encoder_conv_in = nn.Conv2d(cin, channels[0], 3, 1, 1)

    def forward(self, x):
        bs = x.shape[0]
        x = rearrange(x, "b c f h w -> (b f) c h w")
        x = self.unshuffle(x)
        features = []
        x = self.encoder_conv_in(x)
        for res_block, attention_block in zip(self.encoder_down_conv_blocks,
                                              self.encoder_down_attention_blocks):
            for res_layer, attention_layer in zip(res_block, attention_block):
                x = res_layer(x)
                h, w = x.shape[-2:]
                x = rearrange(x, "(b f) c h w -> (b h w) f c", b=bs)
                x = attention_layer(x)
                x = rearrange(x, "(b h w) f c -> (b f) c h w", h=h, w=w)
            features.append(x)
        return features


class CrossAttnDownBlock3D(nn.Module):
    """unet_blocks.py:308-488 — per layer: ResnetBlock2D (per frame) ->
    Transformer2DModel (per frame) -> motion module -> epi module, then a
    stride-2 downsample."""

    def __init__(self, in_channels, out_channels, temb_channels,
                 num_layers=1, resnet_eps=1e-6, resnet_groups=32,
                 attn_num_head_channels=1, cross_attention_dim=1280,
                 add_downsample=True, use_motion_module=True,
                 motion_module_kwargs=None, use_epi_module=True,
                 epi_module_kwargs=None):
        super().__init__()
        resnets, attentions, motion_modules, epi_modules = [], [], [], []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(
                in_channels=in_ch, out_channels=out_channels,
                temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups,
            ))
            attentions.append(Transformer2DModel(
                attn_num_head_channels,
                out_channels // attn_num_head_channels,
                in_channels=out_channels, num_layers=1,
                cross_attention_dim=cross_attention_dim,
                norm_num_groups=resnet_groups,
            ))
            motion_modules.append(
                VanillaTemporalModule(in_channels=out_channels,
                                      **(motion_module_kwargs or {}))
                if use_motion_module else None
            )
            epi_modules.append(
                EpiModule(in_channels=out_channels, **(epi_module_kwargs or {}))
                if use_epi_module else None
            )
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(attentions)
        self.motion_modules = nn.ModuleList(motion_modules)
        self.epi_modules = nn.ModuleList(epi_modules)
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_channels, use_conv=True,
                                        out_channels=out_channels, padding=1,
                                        name="op")])
            if add_downsample else None
        )

    def forward(self, hidden_states, F_mats=None, H_mats=None, temb=None,
                encoder_hidden_states=None, cross_attention_kwargs=None,
                motion_cross_attention_kwargs=None):
        video_length = hidden_states.shape[2]
        temb_repeated = repeat(temb, "b c -> (b f) c", f=video_length)
        output_states = ()
        additional_outputs = []
        for resnet, attn, motion_module, epi_module in zip(
                self.resnets, self.attentions, self.motion_modules,
                self.epi_modules):
            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = resnet(hidden_states, temb_repeated)
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)

            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = attn(
                hidden_states, encoder_hidden_states=encoder_hidden_states,
                cross_attention_kwargs=cross_attention_kwargs,
            ).sample
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)

            if motion_module is not None:
                hidden_states = motion_module(
                    hidden_states, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
            if epi_module is not None:
                hidden_states, aux = epi_module(
                    hidden_states, F_mats, H_mats, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
                additional_outputs += aux
            output_states += (hidden_states,)

        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
                hidden_states = downsampler(hidden_states)
                hidden_states = rearrange(hidden_states,
                                          "(b f) c h w -> b c f h w",
                                          f=video_length)
            output_states += (hidden_states,)
        return hidden_states, output_states, additional_outputs


class DownBlock3D(nn.Module):
    """unet_blocks.py:491-621 — per layer: ResnetBlock2D (per frame) ->
    motion module -> epi module (no spatial attention), optional
    downsample."""

    def __init__(self, in_channels, out_channels, temb_channels,
                 num_layers=1, resnet_eps=1e-6, resnet_groups=32,
                 add_downsample=True, use_motion_module=True,
                 motion_module_kwargs=None, use_epi_module=True,
                 epi_module_kwargs=None):
        super().__init__()
        resnets, motion_modules, epi_modules = [], [], []
        for i in range(num_layers):
            in_ch = in_channels if i == 0 else out_channels
            resnets.append(ResnetBlock2D(
                in_channels=in_ch, out_channels=out_channels,
                temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups,
            ))
            motion_modules.append(
                VanillaTemporalModule(in_channels=out_channels,
                                      **(motion_module_kwargs or {}))
                if use_motion_module else None
            )
            epi_modules.append(
                EpiModule(in_channels=out_channels, **(epi_module_kwargs or {}))
                if use_epi_module else None
            )
        self.resnets = nn.ModuleList(resnets)
        self.motion_modules = nn.ModuleList(motion_modules)
        self.epi_modules = nn.ModuleList(epi_modules)
        self.downsamplers = (
            nn.ModuleList([Downsample2D(out_channels, use_conv=True,
                                        out_channels=out_channels, padding=1,
                                        name="op")])
            if add_downsample else None
        )

    def forward(self, hidden_states, F_mats=None, H_mats=None, temb=None,
                encoder_hidden_states=None,
                motion_cross_attention_kwargs=None, **kwargs):
        video_length = hidden_states.shape[2]
        temb_repeated = repeat(temb, "b c -> (b f) c", f=video_length)
        output_states = ()
        additional_outputs = []
        for resnet, motion_module, epi_module in zip(
                self.resnets, self.motion_modules, self.epi_modules):
            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = resnet(hidden_states, temb_repeated)
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)
            if motion_module is not None:
                hidden_states = motion_module(
                    hidden_states, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
            if epi_module is not None:
                hidden_states, aux = epi_module(
                    hidden_states, F_mats, H_mats, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
                additional_outputs += aux
            output_states += (hidden_states,)

        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = rearrange(hidden_states,
                                          "b c f h w -> (b f) c h w")
                hidden_states = downsampler(hidden_states)
                hidden_states = rearrange(hidden_states,
                                          "(b f) c h w -> b c f h w",
                                          f=video_length)
            output_states += (hidden_states,)
        return hidden_states, output_states, additional_outputs


class UNetMidBlock3DCrossAttn(nn.Module):
    """unet_blocks.py:164-305 — resnet, then per layer: spatial transformer
    -> motion -> epi -> resnet."""

    def __init__(self, in_channels, temb_channels, num_layers=1,
                 resnet_eps=1e-6, resnet_groups=32, attn_num_head_channels=1,
                 cross_attention_dim=1280, use_motion_module=False,
                 motion_module_kwargs=None, use_epi_module=False,
                 epi_module_kwargs=None):
        super().__init__()
        self.has_cross_attention = True
        resnets = [ResnetBlock2D(
            in_channels=in_channels, out_channels=in_channels,
            temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
        )]
        attentions, motion_modules, epi_modules = [], [], []
        for _ in range(num_layers):
            attentions.append(Transformer2DModel(
                attn_num_head_channels,
                in_channels // attn_num_head_channels,
                in_channels=in_channels, num_layers=1,
                cross_attention_dim=cross_attention_dim,
                norm_num_groups=resnet_groups,
            ))
            motion_modules.append(
                VanillaTemporalModule(in_channels=in_channels,
                                      **(motion_module_kwargs or {}))
                if use_motion_module else None
            )
            epi_modules.append(
                EpiModule(in_channels=in_channels, **(epi_module_kwargs or {}))
                if use_epi_module else None
            )
            resnets.append(ResnetBlock2D(
                in_channels=in_channels, out_channels=in_channels,
                temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups,
            ))
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)
        self.motion_modules = nn.ModuleList(motion_modules)
        self.epi_modules = nn.ModuleList(epi_modules)

    def forward(self, hidden_states, F_mats=None, H_mats=None, temb=None,
                encoder_hidden_states=None, cross_attention_kwargs=None,
                motion_cross_attention_kwargs=None, **kwargs):
        video_length = hidden_states.shape[2]
        temb_repeated = repeat(temb, "b c -> (b f) c", f=video_length)

        hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
        hidden_states = self.resnets[0](hidden_states, temb_repeated)
        hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                  f=video_length)

        additional_outputs = []
        for attn, resnet, motion_module, epi_module in zip(
                self.attentions, self.resnets[1:], self.motion_modules,
                self.epi_modules):
            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = attn(
                hidden_states, encoder_hidden_states=encoder_hidden_states,
                cross_attention_kwargs=cross_attention_kwargs,
            ).sample
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)
            if motion_module is not None:
                hidden_states = motion_module(
                    hidden_states, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
            if epi_module is not None:
                hidden_states, aux = epi_module(
                    hidden_states, F_mats, H_mats, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
                additional_outputs += aux
            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = resnet(hidden_states, temb_repeated)
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)
        return hidden_states, additional_outputs


class CrossAttnUpBlock3D(nn.Module):
    """unet_blocks.py:624-809 — per layer: concat(skip) -> resnet -> spatial
    transformer -> motion -> epi, then upsample."""

    def __init__(self, in_channels, out_channels, prev_output_channel,
                 temb_channels, num_layers=1, resnet_eps=1e-6,
                 resnet_groups=32, attn_num_head_channels=1,
                 cross_attention_dim=1280, add_upsample=True,
                 use_motion_module=True, motion_module_kwargs=None,
                 use_epi_module=True, epi_module_kwargs=None):
        super().__init__()
        self.has_cross_attention = True
        resnets, attentions, motion_modules, epi_modules = [], [], [], []
        for i in range(num_layers):
            res_skip_channels = (in_channels if (i == num_layers - 1)
                                 else out_channels)
            resnet_in_channels = (prev_output_channel if i == 0
                                  else out_channels)
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=out_channels, temb_channels=temb_channels,
                eps=resnet_eps, groups=resnet_groups,
            ))
            attentions.append(Transformer2DModel(
                attn_num_head_channels,
                out_channels // attn_num_head_channels,
                in_channels=out_channels, num_layers=1,
                cross_attention_dim=cross_attention_dim,
                norm_num_groups=resnet_groups,
            ))
            motion_modules.append(
                VanillaTemporalModule(in_channels=out_channels,
                                      **(motion_module_kwargs or {}))
                if use_motion_module else None
            )
            epi_modules.append(
                EpiModule(in_channels=out_channels, **(epi_module_kwargs or {}))
                if use_epi_module else None
            )
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)
        self.motion_modules = nn.ModuleList(motion_modules)
        self.epi_modules = nn.ModuleList(epi_modules)
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_channels, use_conv=True,
                                      out_channels=out_channels)])
            if add_upsample else None
        )

    def forward(self, hidden_states, res_hidden_states_tuple, F_mats=None,
                H_mats=None, temb=None, encoder_hidden_states=None,
                upsample_size=None, cross_attention_kwargs=None,
                motion_cross_attention_kwargs=None, **kwargs):
        video_length = hidden_states.shape[2]
        temb_repeated = repeat(temb, "b c -> (b f) c", f=video_length)
        additional_outputs = []
        for resnet, attn, motion_module, epi_module in zip(
                self.resnets, self.attentions, self.motion_modules,
                self.epi_modules):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states], dim=1)

            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = resnet(hidden_states, temb_repeated)
            hidden_states = attn(
                hidden_states, encoder_hidden_states=encoder_hidden_states,
                cross_attention_kwargs=cross_attention_kwargs,
            ).sample
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)
            if motion_module is not None:
                hidden_states = motion_module(
                    hidden_states, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
            if epi_module is not None:
                hidden_states, aux = epi_module(
                    hidden_states, F_mats, H_mats, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
                additional_outputs += aux

        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = rearrange(hidden_states,
                                          "b c f h w -> (b f) c h w")
                hidden_states = upsampler(hidden_states, upsample_size)
                hidden_states = rearrange(hidden_states,
                                          "(b f) c h w -> b c f h w",
                                          f=video_length)
        return hidden_states, additional_outputs


class UpBlock3D(nn.Module):
    """unet_blocks.py:812-939 — per layer: concat(skip) -> resnet -> motion
    -> epi (no spatial attention), then upsample."""

    def __init__(self, in_channels, prev_output_channel, out_channels,
                 temb_channels, num_layers=1, resnet_eps=1e-6,
                 resnet_groups=32, add_upsample=True, use_motion_module=True,
                 motion_module_kwargs=None, use_epi_module=True,
                 epi_module_kwargs=None):
        super().__init__()
        resnets, motion_modules, epi_modules = [], [], []
        for i in range(num_layers):
            res_skip_channels = (in_channels if (i == num_layers - 1)
                                 else out_channels)
            resnet_in_channels = (prev_output_channel if i == 0
                                  else out_channels)
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=out_channels, temb_channels=temb_channels,
                eps=resnet_eps, groups=resnet_groups,
            ))
            motion_modules.append(
                VanillaTemporalModule(in_channels=out_channels,
                                      **(motion_module_kwargs or {}))
                if use_motion_module else None
            )
            epi_modules.append(
                EpiModule(in_channels=out_channels, **(epi_module_kwargs or {}))
                if use_epi_module else None
            )
        self.resnets = nn.ModuleList(resnets)
        self.motion_modules = nn.ModuleList(motion_modules)
        self.epi_modules = nn.ModuleList(epi_modules)
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_channels, use_conv=True,
                                      out_channels=out_channels)])
            if add_upsample else None
        )

    def forward(self, hidden_states, res_hidden_states_tuple, F_mats=None,
                H_mats=None, temb=None, upsample_size=None,
                encoder_hidden_states=None,
                motion_cross_attention_kwargs=None, **kwargs):
        video_length = hidden_states.shape[2]
        temb_repeated = repeat(temb, "b c -> (b f) c", f=video_length)
        additional_outputs = []
        for resnet, motion_module, epi_module in zip(
                self.resnets, self.motion_modules, self.epi_modules):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states], dim=1)

            hidden_states = rearrange(hidden_states, "b c f h w -> (b f) c h w")
            hidden_states = resnet(hidden_states, temb_repeated)
            hidden_states = rearrange(hidden_states, "(b f) c h w -> b c f h w",
                                      f=video_length)
            if motion_module is not None:
                hidden_states = motion_module(
                    hidden_states, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
            if epi_module is not None:
                hidden_states, aux = epi_module(
                    hidden_states, F_mats, H_mats, temb=temb,
                    encoder_hidden_states=encoder_hidden_states,
                    cross_attention_kwargs=motion_cross_attention_kwargs,
                )
                additional_outputs += aux

        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = rearrange(hidden_states,
                                          "b c f h w -> (b f) c h w")
                hidden_states = upsampler(hidden_states, upsample_size)
                hidden_states = rearrange(hidden_states,
                                          "(b f) c h w -> b c f h w",
                                          f=video_length)
        return hidden_states, additional_outputs


class UNet3DConditionModelPoseCond(nn.Module):
    """The full reference UNet (unet.py:917-1452) at inference defaults:
    SD1.5 block plan (CrossAttnDownBlock3D x3 + DownBlock3D down; UpBlock3D
    + CrossAttnUpBlock3D x3 up), fusers off, controlnet residuals off,
    class embedding off, decoder_add_posecond=True. Covers conv_in, time
    embedding (Timesteps flip_sin_to_cos=True freq_shift=0 ->
    TimestepEmbedding, unet.py:122-125), per-resolution pose-feature
    routing, skip-connection plumbing, frame-wise conv_norm_out
    (unet.py:1422-1424) and the additional_channel auxiliary head
    (unet.py:1429-1445)."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, norm_num_groups=32, norm_eps=1e-5,
                 resnet_eps=1e-6, attn_num_head_channels=8,
                 cross_attention_dim=768, additional_channel=0,
                 use_motion_module=True, motion_module_kwargs=None,
                 motion_module_mid_block=False,
                 use_epi_module=True, epi_module_kwargs=None,
                 epi_module_mid_block=False):
        super().__init__()
        ch = block_out_channels
        time_embed_dim = ch[0] * 4
        self.time_proj = Timesteps(ch[0], flip_sin_to_cos=True,
                                   downscale_freq_shift=0.0)
        self.time_embedding = TimestepEmbedding(ch[0], time_embed_dim)
        self.conv_in = InflatedConv3d(in_channels, ch[0], kernel_size=3,
                                      padding=1)

        common = dict(temb_channels=time_embed_dim, resnet_eps=resnet_eps,
                      resnet_groups=norm_num_groups,
                      use_motion_module=use_motion_module,
                      motion_module_kwargs=motion_module_kwargs,
                      use_epi_module=use_epi_module,
                      epi_module_kwargs=epi_module_kwargs)
        down_blocks = []
        output_channel = ch[0]
        for i in range(len(ch)):
            input_channel = output_channel
            output_channel = ch[i]
            is_final = i == len(ch) - 1
            if not is_final:
                down_blocks.append(CrossAttnDownBlock3D(
                    in_channels=input_channel, out_channels=output_channel,
                    num_layers=layers_per_block,
                    attn_num_head_channels=attn_num_head_channels,
                    cross_attention_dim=cross_attention_dim,
                    add_downsample=True,
                    temb_channels=time_embed_dim, resnet_groups=norm_num_groups,
                    motion_module_kwargs=motion_module_kwargs,
                    use_motion_module=use_motion_module,
                    use_epi_module=use_epi_module,
                    epi_module_kwargs=epi_module_kwargs,
                ))
            else:
                down_blocks.append(DownBlock3D(
                    in_channels=input_channel, out_channels=output_channel,
                    num_layers=layers_per_block, add_downsample=False,
                    **common,
                ))
        self.down_blocks = nn.ModuleList(down_blocks)

        self.mid_block = UNetMidBlock3DCrossAttn(
            in_channels=ch[-1], temb_channels=time_embed_dim,
            num_layers=1, resnet_eps=resnet_eps,
            resnet_groups=norm_num_groups,
            attn_num_head_channels=attn_num_head_channels,
            cross_attention_dim=cross_attention_dim,
            use_motion_module=use_motion_module and motion_module_mid_block,
            motion_module_kwargs=motion_module_kwargs,
            use_epi_module=use_epi_module and epi_module_mid_block,
            epi_module_kwargs=epi_module_kwargs,
        )

        up_blocks = []
        rev = list(reversed(ch))
        output_channel = rev[0]
        for i in range(len(ch)):
            prev_output_channel = output_channel
            output_channel = rev[i]
            input_channel = rev[min(i + 1, len(ch) - 1)]
            is_final = i == len(ch) - 1
            if i == 0:
                up_blocks.append(UpBlock3D(
                    in_channels=input_channel,
                    prev_output_channel=prev_output_channel,
                    out_channels=output_channel,
                    num_layers=layers_per_block + 1,
                    add_upsample=not is_final, **common,
                ))
            else:
                up_blocks.append(CrossAttnUpBlock3D(
                    in_channels=input_channel, out_channels=output_channel,
                    prev_output_channel=prev_output_channel,
                    num_layers=layers_per_block + 1,
                    attn_num_head_channels=attn_num_head_channels,
                    cross_attention_dim=cross_attention_dim,
                    add_upsample=not is_final,
                    temb_channels=time_embed_dim, resnet_groups=norm_num_groups,
                    motion_module_kwargs=motion_module_kwargs,
                    use_motion_module=use_motion_module,
                    use_epi_module=use_epi_module,
                    epi_module_kwargs=epi_module_kwargs,
                ))
        self.up_blocks = nn.ModuleList(up_blocks)

        self.conv_norm_out = nn.GroupNorm(num_channels=ch[0],
                                          num_groups=norm_num_groups,
                                          eps=norm_eps)
        self.conv_act = nn.SiLU()
        self.conv_out = InflatedConv3d(ch[0], out_channels, kernel_size=3,
                                       padding=1)
        self.additional_channel = additional_channel
        if additional_channel > 0:
            self.conv_auxiliary_query = InflatedConv3d(
                ch[0], additional_channel, kernel_size=1)
            self.conv_auxiliary_key = InflatedConv3d(
                ch[0], additional_channel, kernel_size=1)

    def forward(self, sample, timestep, encoder_hidden_states, F_mats=None,
                H_mats=None, pose_embedding_features=None):
        video_length = sample.shape[2]
        timesteps = timestep.expand(sample.shape[0])
        t_emb = self.time_proj(timesteps)
        emb = self.time_embedding(t_emb)

        encoder_hidden_states = repeat(encoder_hidden_states,
                                       "b n c -> (b f) n c", f=video_length)
        sample = self.conv_in(sample)

        if pose_embedding_features is None:
            pose_embedding_features = [None] * len(self.down_blocks)

        down_block_res_samples = (sample,)
        additional_outputs = []
        for downsample_block, pose_feature in zip(self.down_blocks,
                                                  pose_embedding_features):
            sample, res_samples, aux = downsample_block(
                hidden_states=sample, F_mats=F_mats, H_mats=H_mats, temb=emb,
                encoder_hidden_states=encoder_hidden_states,
                cross_attention_kwargs={"pose_feature": pose_feature},
                motion_cross_attention_kwargs={"pose_feature": pose_feature},
            )
            down_block_res_samples += res_samples
            additional_outputs += aux

        sample, aux = self.mid_block(
            sample, F_mats, H_mats, emb,
            encoder_hidden_states=encoder_hidden_states,
            cross_attention_kwargs={"pose_feature": pose_embedding_features[-1]},
            motion_cross_attention_kwargs={
                "pose_feature": pose_embedding_features[-1]},
        )
        additional_outputs += aux

        for i, upsample_block in enumerate(self.up_blocks):
            pose_feature = pose_embedding_features[-(i + 1)]
            res_samples = down_block_res_samples[-len(upsample_block.resnets):]
            down_block_res_samples = down_block_res_samples[
                : -len(upsample_block.resnets)]
            sample, aux = upsample_block(
                hidden_states=sample, res_hidden_states_tuple=res_samples,
                F_mats=F_mats, H_mats=H_mats, temb=emb,
                encoder_hidden_states=encoder_hidden_states,
                cross_attention_kwargs={"pose_feature": pose_feature},
                motion_cross_attention_kwargs={"pose_feature": pose_feature},
            )
            additional_outputs += aux

        sample = rearrange(sample, "b c f h w -> (b f) c h w")
        sample = self.conv_norm_out(sample)
        sample = rearrange(sample, "(b f) c h w -> b c f h w", f=video_length)
        sample = self.conv_act(sample)
        sample_out = self.conv_out(sample)

        if self.additional_channel > 0:
            last_query = additional_outputs[-1]["query"]
            last_key = additional_outputs[-1]["key"]
            feat_size = int(last_query.shape[1] ** 0.5)
            last_query = rearrange(last_query, "(b f) (h w) c -> b c f h w",
                                   f=video_length, h=feat_size, w=feat_size)
            last_key = rearrange(last_key, "(b f) (h w) c -> b c f h w",
                                 f=video_length, h=feat_size, w=feat_size)
            auxiliary = torch.cat([self.conv_auxiliary_query(last_query),
                                   self.conv_auxiliary_key(last_key)], dim=1)
        else:
            auxiliary = None
        return sample_out, auxiliary, additional_outputs
