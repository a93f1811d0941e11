"""Shared tiny model bundle for pipeline/train tests (fast CPU init)."""
import jax
import jax.numpy as jnp

from cvd_tpu.models.clip_text import CLIPTextConfig
from cvd_tpu.models.unet import UNetConfig
from cvd_tpu.models.vae import VAEConfig
from cvd_tpu.pipelines.common import PipelineModules

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    attention_heads=4,
    cross_attention_dim=24,
    norm_num_groups=8,
)
TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8)
TINY_CLIP = CLIPTextConfig(
    vocab_size=49408, hidden_size=24, num_layers=2, num_heads=4, intermediate_size=48
)

_CACHE = {}


def tiny_modules(latent_size=8, video_length=2) -> PipelineModules:
    key = (latent_size, video_length)
    if key not in _CACHE:
        _CACHE[key] = PipelineModules.create(
            unet_config=TINY_UNET,
            vae_config=TINY_VAE,
            clip_config=TINY_CLIP,
            latent_size=latent_size,
            video_length=video_length,
        )
    return _CACHE[key]
