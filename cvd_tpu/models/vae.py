"""AutoencoderKL (SD1.5 VAE) in Flax, channels-last.

Matches diffusers' AutoencoderKL architecture (the reference loads it with
``AutoencoderKL.from_pretrained(..., subfolder="vae")``, inference_epi.py:76)
so SD1.5 / civitai VAE weights import mechanically.

TPU-first: encode/decode run whole batches of frames at once — the
reference's per-frame Python decode loop (pipeline_animation_epi.py:366-379)
becomes one jitted call.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvd_tpu.models.layers import FusedGroupNorm, Conv2d, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32


class VAEAttention(nn.Module):
    """Single-head spatial self-attention in the VAE mid blocks."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, H, W, C = x.shape
        residual = x
        h = FusedGroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(N, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(jnp.asarray(C, h.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(h.dtype)
        h = jnp.einsum("bqk,bkc->bqc", probs, v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(h)
        return h.reshape(N, H, W, C) + residual


class _MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, use_time_emb=False, groups=self.groups,
                          dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, use_time_emb=False, groups=self.groups,
                          dtype=self.dtype, name="resnets_1")(x)
        return x


class _DownBlock(nn.Module):
    channels: int
    layers: int
    add_downsample: bool
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for j in range(self.layers):
            x = ResnetBlock2D(self.channels, use_time_emb=False, groups=self.groups,
                              dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = _VAEDownsample(self.channels, self.dtype, name="downsamplers_0")(x)
        return x


class _VAEDownsample(nn.Module):
    channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        # diffusers VAE downsample: pad (0,1,0,1) then stride-2 VALID conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class _UpBlock(nn.Module):
    channels: int
    layers: int
    add_upsample: bool
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for j in range(self.layers):
            x = ResnetBlock2D(self.channels, use_time_emb=False, groups=self.groups,
                              dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ch = cfg.block_out_channels
        x = Conv2d(ch[0], 3, 1, 1, dtype=cfg.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            x = _DownBlock(c, cfg.layers_per_block, i < len(ch) - 1,
                           cfg.norm_num_groups, cfg.dtype, name=f"down_blocks_{i}")(x)
        x = _MidBlock(ch[-1], cfg.norm_num_groups, cfg.dtype, name="mid_block")(x)
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                           dtype=cfg.dtype, act="silu", name="conv_norm_out")(x)
        return Conv2d(2 * cfg.latent_channels, 3, 1, 1, dtype=cfg.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ch = list(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
        x = Conv2d(ch[0], 3, 1, 1, dtype=cfg.dtype, name="conv_in")(z)
        x = _MidBlock(ch[0], cfg.norm_num_groups, cfg.dtype, name="mid_block")(x)
        for i, c in enumerate(ch):
            x = _UpBlock(c, cfg.layers_per_block + 1, i < len(ch) - 1,
                         cfg.norm_num_groups, cfg.dtype, name=f"up_blocks_{i}")(x)
        x = FusedGroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                           dtype=cfg.dtype, act="silu", name="conv_norm_out")(x)
        return Conv2d(cfg.out_channels, 3, 1, 1, dtype=cfg.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode latents -> images. [N, H, W, C]."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = Conv2d(2 * self.config.latent_channels, 1, 1, 0,
                                 dtype=self.config.dtype, name="quant_conv")
        self.post_quant_conv = Conv2d(self.config.latent_channels, 1, 1, 0,
                                      dtype=self.config.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_posterior(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        z = self.sample_posterior(x, rng)
        return self.decode(z)
