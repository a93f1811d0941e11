"""CLIP text encoder (openai/clip-vit-large-patch14 text model) in Flax.

SD1.5's prompt encoder (the reference loads it via transformers
CLIPTextModel, inference_epi.py:78). Implemented here so PyTorch weights map
mechanically and prompt encoding is one jitted call on device.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, L, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=c.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=c.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=c.dtype, name="v_proj")(x)
        q = q.reshape(B, L, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, c.num_heads, head_dim).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(head_dim)
        logits = logits + causal_mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=c.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """input_ids [B, 77] -> last_hidden_state [B, 77, 768]."""

    config: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        B, L = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, :L].astype(tok.dtype)
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)[None, None]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=c.dtype, name="final_layer_norm"
        )(x)
