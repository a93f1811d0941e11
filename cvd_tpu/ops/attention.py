"""XLA reference attention with a materialized additive bias.

The epi attention's bias is an additive float mask [B, Lq, Lk] (or
[B, H, Lq, Lk]); this path materializes it like the reference's SDPA call
(attention_processor.py:617-619). It serves as the parity/verification
reference, the GSPMD fallback, and the multi-group (m>1 kv routing) path.
The production paths are the fused Pallas kernels in ops/epi_flash.py
(bias evaluated per tile in VMEM from factored line geometry) and
ops/temporal_attn.py.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def attention_with_bias(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q, k, v: [B, heads, L, D]; bias: [B, Lq, Lk] or [B, heads, Lq, Lk].

    Softmax is computed in f32 regardless of input dtype (matches torch SDPA
    behavior closely enough at bf16 activations).
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    # exact f32 multiplies for f32 activations; bf16 keeps the fast MXU path
    precision = "highest" if q.dtype == jnp.float32 else None
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision) * scale
    logits = logits.astype(jnp.float32)
    if bias is not None:
        if bias.ndim == 3:
            bias = bias[:, None]
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision)
