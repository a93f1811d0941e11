"""Minimal torch re-implementations of the diffusers 0.24 pieces the
reference modules instantiate (diffusers is not installed here).

Forward math follows diffusers 0.24.0 exactly for the configurations the
reference uses (defaults unless noted):

* ``Attention``           — diffusers/models/attention_processor.py
                            (bias-free q/k/v, biased out-proj, scale =
                            dim_head**-0.5, 3-D additive masks repeated
                            per head, baddbmm+softmax score path)
* ``FeedForward``/``GEGLU`` — diffusers/models/attention.py (exact gelu)
* ``LoRALinearLayer``     — diffusers/models/lora.py (down/up, zero up,
                            network_alpha/rank scaling)
* ``ResnetBlock2D``       — diffusers/models/resnet.py (pre-norm, silu,
                            temb add, 1x1 shortcut on channel change)
* ``Transformer2DModel``  — diffusers/models/transformer_2d.py with
                            use_linear_projection=False (conv 1x1 proj)
* ``BasicTransformerBlock`` — diffusers/models/attention.py (LN(1e-5) ->
                            self attn -> LN -> cross attn -> LN -> geglu ff)
* ``Downsample2D``        — stride-2 3x3 conv, attr name ``conv`` (the
                            SD1.5 diffusers state-dict key layout)

State-dict key names match real diffusers-era checkpoints so these oracles
also validate cvd_tpu.io.key_mapping against realistic key sets.
"""
from __future__ import annotations

import math
from typing import Optional

import torch
import torch.nn.functional as F
from torch import nn


class LoRALinearLayer(nn.Module):
    def __init__(self, in_features, out_features, rank=4, network_alpha=None):
        super().__init__()
        self.down = nn.Linear(in_features, rank, bias=False)
        self.up = nn.Linear(rank, out_features, bias=False)
        self.network_alpha = network_alpha
        self.rank = rank
        nn.init.normal_(self.down.weight, std=1 / rank)
        nn.init.zeros_(self.up.weight)

    def forward(self, hidden_states):
        out = self.up(self.down(hidden_states))
        if self.network_alpha is not None:
            out = out * (self.network_alpha / self.rank)
        return out


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact (erf) gelu, the torch default


class FeedForward(nn.Module):
    """dim -> GEGLU(4*dim) -> dropout -> Linear(4*dim, dim)."""

    def __init__(self, dim, dropout=0.0, activation_fn="geglu", mult=4):
        super().__init__()
        assert activation_fn == "geglu"
        inner = dim * mult
        self.net = nn.ModuleList([GEGLU(dim, inner), nn.Dropout(dropout),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class Attention(nn.Module):
    """diffusers Attention with the defaults the reference relies on:
    no group_norm/spatial_norm/norm_cross, residual_connection=False,
    rescale_output_factor=1.0, scale_qk=True."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False,
                 upcast_attention=False, **_ignored):
        super().__init__()
        inner_dim = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.upcast_attention = upcast_attention
        self.group_norm = None
        self.spatial_norm = None
        self.norm_cross = False
        self.residual_connection = False
        self.rescale_output_factor = 1.0
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim or query_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim or query_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim, bias=True),
                                     nn.Dropout(dropout)])
        self.processor = None

    # --- diffusers helper methods used by the reference processors ---
    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim=3):
        if attention_mask is None:
            return None
        head_size = self.heads
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(
                attention_mask, (0, target_length - current_length), value=0.0
            )
        if out_dim == 3:
            if attention_mask.shape[0] < batch_size * head_size:
                attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        return attention_mask

    def head_to_batch_dim(self, tensor):
        B, L, dim = tensor.shape
        tensor = tensor.reshape(B, L, self.heads, dim // self.heads)
        return tensor.permute(0, 2, 1, 3).reshape(B * self.heads, L, dim // self.heads)

    def batch_to_head_dim(self, tensor):
        BH, L, d = tensor.shape
        tensor = tensor.reshape(BH // self.heads, self.heads, L, d)
        return tensor.permute(0, 2, 1, 3).reshape(BH // self.heads, L, d * self.heads)

    def get_attention_scores(self, query, key, attention_mask=None):
        dtype = query.dtype
        if self.upcast_attention:
            query = query.float()
            key = key.float()
        if attention_mask is None:
            baddbmm_input = torch.empty(
                query.shape[0], query.shape[1], key.shape[1],
                dtype=query.dtype, device=query.device,
            )
            beta = 0
        else:
            baddbmm_input = attention_mask
            beta = 1
        scores = torch.baddbmm(
            baddbmm_input, query, key.transpose(-1, -2), beta=beta, alpha=self.scale
        )
        probs = scores.softmax(dim=-1)
        return probs.to(dtype)

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask,
                              **cross_attention_kwargs)


class ResnetBlock2D(nn.Module):
    """Pre-norm resnet: GN -> silu -> conv3x3 -> +temb -> GN -> silu ->
    conv3x3 -> + (1x1 shortcut)."""

    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, groups=32, dropout=0.0,
                 time_embedding_norm="default", non_linearity="swish",
                 output_scale_factor=1.0, pre_norm=True):
        super().__init__()
        assert time_embedding_norm == "default" and pre_norm
        out_channels = out_channels or in_channels
        self.output_scale_factor = output_scale_factor
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, 1, 1)
        self.time_emb_proj = (
            nn.Linear(temb_channels, out_channels) if temb_channels else None
        )
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, 1, 1)
        self.nonlinearity = nn.SiLU()
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1, 1, 0)
            if in_channels != out_channels else None
        )

    def forward(self, input_tensor, temb):
        h = self.norm1(input_tensor)
        h = self.nonlinearity(h)
        h = self.conv1(h)
        if temb is not None and self.time_emb_proj is not None:
            h = h + self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
        h = self.norm2(h)
        h = self.nonlinearity(h)
        h = self.dropout(h)
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + h) / self.output_scale_factor


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 cross_attention_dim=768, upcast_attention=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(query_dim=dim, heads=num_attention_heads,
                               dim_head=attention_head_dim,
                               upcast_attention=upcast_attention)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(query_dim=dim,
                               cross_attention_dim=cross_attention_dim,
                               heads=num_attention_heads,
                               dim_head=attention_head_dim,
                               upcast_attention=upcast_attention)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, hidden_states, encoder_hidden_states=None,
                cross_attention_kwargs=None):
        kwargs = cross_attention_kwargs or {}
        hidden_states = self.attn1(self.norm1(hidden_states),
                                   encoder_hidden_states=None, **kwargs) + hidden_states
        hidden_states = self.attn2(self.norm2(hidden_states),
                                   encoder_hidden_states=encoder_hidden_states,
                                   **kwargs) + hidden_states
        hidden_states = self.ff(self.norm3(hidden_states)) + hidden_states
        return hidden_states


class _T2DOutput:
    def __init__(self, sample):
        self.sample = sample


class Transformer2DModel(nn.Module):
    """Continuous-input spatial transformer, conv 1x1 projections
    (SD1.5 use_linear_projection=False)."""

    def __init__(self, num_attention_heads, attention_head_dim, in_channels,
                 num_layers=1, cross_attention_dim=768, norm_num_groups=32,
                 use_linear_projection=False, only_cross_attention=False,
                 upcast_attention=False):
        super().__init__()
        assert not use_linear_projection and not only_cross_attention
        inner_dim = num_attention_heads * attention_head_dim
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Conv2d(in_channels, inner_dim, 1, 1, 0)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(inner_dim, num_attention_heads,
                                  attention_head_dim, cross_attention_dim,
                                  upcast_attention)
            for _ in range(num_layers)
        ])
        self.proj_out = nn.Conv2d(inner_dim, in_channels, 1, 1, 0)

    def forward(self, hidden_states, encoder_hidden_states=None,
                cross_attention_kwargs=None):
        N, C, H, W = hidden_states.shape
        residual = hidden_states
        h = self.norm(hidden_states)
        h = self.proj_in(h)
        inner = h.shape[1]
        h = h.permute(0, 2, 3, 1).reshape(N, H * W, inner)
        for block in self.transformer_blocks:
            h = block(h, encoder_hidden_states=encoder_hidden_states,
                      cross_attention_kwargs=cross_attention_kwargs)
        h = h.reshape(N, H, W, inner).permute(0, 3, 1, 2)
        h = self.proj_out(h)
        return _T2DOutput(h + residual)


class Downsample2D(nn.Module):
    """stride-2 3x3 conv; attribute name 'conv' as in SD1.5 state dicts."""

    def __init__(self, channels, use_conv=True, out_channels=None, padding=1,
                 name="op"):
        super().__init__()
        assert use_conv
        self.conv = nn.Conv2d(channels, out_channels or channels, 3, 2, padding)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    """nearest x2 (optional forced output size) + 3x3 conv, attr ``conv``
    (diffusers/models/resnet.py Upsample2D with use_conv=True)."""

    def __init__(self, channels, use_conv=True, out_channels=None):
        super().__init__()
        assert use_conv
        self.conv = nn.Conv2d(channels, out_channels or channels, 3, padding=1)

    def forward(self, x, output_size=None):
        if output_size is None:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        else:
            x = F.interpolate(x, size=output_size, mode="nearest")
        return self.conv(x)


class Timesteps(nn.Module):
    """diffusers get_timestep_embedding with the SD1.5 UNet construction
    (unet.py:122: flip_sin_to_cos=True, downscale_freq_shift=0)."""

    def __init__(self, num_channels, flip_sin_to_cos=True,
                 downscale_freq_shift=0.0):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        half_dim = self.num_channels // 2
        exponent = -math.log(10000.0) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device
        )
        exponent = exponent / (half_dim - self.downscale_freq_shift)
        emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
        sin, cos = torch.sin(emb), torch.cos(emb)
        emb = (torch.cat([cos, sin], dim=-1) if self.flip_sin_to_cos
               else torch.cat([sin, cos], dim=-1))
        if self.num_channels % 2 == 1:
            emb = F.pad(emb, (0, 1, 0, 0))
        return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers/models/embeddings.py)."""

    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class DDIMSchedulerOracle:
    """diffusers 0.24 DDIMScheduler as configured by the reference
    (configs/inference_config.yaml:58-64: 1000 train steps, linear betas
    0.00085 -> 0.012, steps_offset=1, clip_sample=False) with the defaults
    the reference relies on (epsilon prediction, set_alpha_to_one=True,
    eta=0, 'leading' timestep spacing). Schedule tables in float64 like
    diffusers' numpy path, steps in int64."""

    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, steps_offset=1):
        import numpy as np

        self.num_train_timesteps = num_train_timesteps
        self.steps_offset = steps_offset
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = 1.0  # set_alpha_to_one=True
        self.init_noise_sigma = 1.0
        self.timesteps = None
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps):
        import numpy as np

        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // num_inference_steps
        self.timesteps = (
            (np.arange(0, num_inference_steps) * step_ratio)
            .round()[::-1].copy().astype(np.int64) + self.steps_offset
        )

    def scale_model_input(self, sample, t=None):
        return sample

    def step(self, model_output, timestep, sample):
        """x_t -> x_{t-1}, epsilon prediction, eta=0, no clipping."""
        t = int(timestep)
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        alpha_prod_t = float(self.alphas_cumprod[t])
        alpha_prod_t_prev = (
            float(self.alphas_cumprod[prev_t]) if prev_t >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1.0 - alpha_prod_t
        pred_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
        pred_dir = (1.0 - alpha_prod_t_prev) ** 0.5 * model_output
        return alpha_prod_t_prev**0.5 * pred_x0 + pred_dir

    def add_noise(self, original, noise, timesteps):
        """forward diffusion q(x_t | x_0) (train-time add_noise)."""
        import numpy as np

        acp = torch.from_numpy(
            np.asarray(self.alphas_cumprod[np.asarray(timesteps)])
        ).to(original.dtype)
        while acp.ndim < original.ndim:
            acp = acp[..., None]
        return acp**0.5 * original + (1.0 - acp) ** 0.5 * noise


class VAEAttentionOracle(nn.Module):
    """diffusers 0.24 VAE mid-block Attention (single head, in-attention
    GroupNorm, residual add): state keys group_norm / to_q / to_k / to_v /
    to_out.0 (the post-0.17 renamed layout)."""

    def __init__(self, channels, norm_num_groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(norm_num_groups, channels, eps=1e-6,
                                       affine=True)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])
        self.scale = channels**-0.5

    def forward(self, x):
        B, C, H, W = x.shape
        residual = x
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(1, 2) * self.scale, dim=-1)
        h = self.to_out[0](attn @ v)
        return h.transpose(1, 2).reshape(B, C, H, W) + residual


class _VAEMidBlock(nn.Module):
    def __init__(self, channels, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(channels, channels, temb_channels=None, groups=groups),
            ResnetBlock2D(channels, channels, temb_channels=None, groups=groups),
        ])
        self.attentions = nn.ModuleList([VAEAttentionOracle(channels, groups)])

    def forward(self, x):
        x = self.resnets[0](x, None)
        x = self.attentions[0](x)
        return self.resnets[1](x, None)


class _VAEDownBlock(nn.Module):
    """DownEncoderBlock2D: resnets + (0,1,0,1)-padded stride-2 conv."""

    def __init__(self, in_ch, out_ch, layers, add_downsample, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch,
                          temb_channels=None, groups=groups)
            for j in range(layers)
        ])
        self.downsamplers = None
        if add_downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x):
        for r in self.resnets:
            x = r(x, None)
        if self.downsamplers is not None:
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class _VAEUpBlock(nn.Module):
    """UpDecoderBlock2D: layers+1 resnets + nearest-x2 upsample conv."""

    def __init__(self, in_ch, out_ch, layers, add_upsample, groups):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch,
                          temb_channels=None, groups=groups)
            for j in range(layers)
        ])
        self.upsamplers = (
            nn.ModuleList([Upsample2D(out_ch)]) if add_upsample else None
        )

    def forward(self, x):
        for r in self.resnets:
            x = r(x, None)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class AutoencoderKLOracle(nn.Module):
    """diffusers 0.24 AutoencoderKL at the SD1.5 config shape: encoder
    (conv_in, DownEncoderBlock2D x4, mid, GN+silu, conv_out -> 2*latent),
    quant/post_quant 1x1 convs, decoder (conv_in, mid, UpDecoderBlock2D x4,
    GN+silu, conv_out). State-dict keys match real diffusers-era VAE files."""

    def __init__(self, block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, norm_num_groups=32, in_channels=3,
                 out_channels=3, latent_channels=4):
        super().__init__()
        ch = list(block_out_channels)
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(in_channels, ch[0], 3, 1, 1)
        enc.down_blocks = nn.ModuleList([
            _VAEDownBlock(ch[max(i - 1, 0)], c, layers_per_block,
                          i < len(ch) - 1, norm_num_groups)
            for i, c in enumerate(ch)
        ])
        enc.mid_block = _VAEMidBlock(ch[-1], norm_num_groups)
        enc.conv_norm_out = nn.GroupNorm(norm_num_groups, ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * latent_channels, 3, 1, 1)
        self.encoder = enc

        rch = list(reversed(ch))
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent_channels, rch[0], 3, 1, 1)
        dec.mid_block = _VAEMidBlock(rch[0], norm_num_groups)
        dec.up_blocks = nn.ModuleList([
            _VAEUpBlock(rch[max(i - 1, 0)], c, layers_per_block + 1,
                        i < len(rch) - 1, norm_num_groups)
            for i, c in enumerate(rch)
        ])
        dec.conv_norm_out = nn.GroupNorm(norm_num_groups, rch[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rch[-1], out_channels, 3, 1, 1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)
        self.act = nn.SiLU()

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            h = blk(h)
        h = self.encoder.mid_block(h)
        h = self.act(self.encoder.conv_norm_out(h))
        return self.quant_conv(self.encoder.conv_out(h))

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for blk in self.decoder.up_blocks:
            h = blk(h)
        h = self.act(self.decoder.conv_norm_out(h))
        return self.decoder.conv_out(h)
