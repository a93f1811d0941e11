"""Fused temporal attention kernel vs the XLA einsum reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu.models.motion import causal_temporal_mask
from cvd_tpu.ops.temporal_attn import temporal_flash_attention


def einsum_reference(q, k, v, mask, heads):
    """q/k/v pixel-major [B, N, F, C]."""
    B, N, F, C = q.shape
    D = C // heads
    qh = q.reshape(B, N, F, heads, D)
    kh = k.reshape(B, N, F, heads, D)
    vh = v.reshape(B, N, F, heads, D)
    logits = jnp.einsum("bnfhd,bnghd->bnhfg", qh, kh,
                        precision="highest") / np.sqrt(D)
    logits = logits.astype(jnp.float32)
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnhfg,bnghd->bnfhd", probs, vh, precision="highest")
    return out.reshape(B, N, F, C)


@pytest.mark.parametrize("mask_kind", [None, "causal", "circle"])
def test_temporal_kernel_matches_einsum(mask_kind):
    rng = np.random.default_rng(0)
    B, N, F, C, H = 2, 256, 8, 48, 4
    q = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    mask = causal_temporal_mask(mask_kind, F) if mask_kind else None
    ref = einsum_reference(q, k, v, mask, H)
    got = temporal_flash_attention(q, k, v, mask, heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_temporal_kernel_gradients():
    rng = np.random.default_rng(1)
    B, N, F, C, H = 1, 128, 4, 32, 2
    q = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)

    gr = jax.grad(lambda *a: jnp.sum(einsum_reference(*a, None, H) * g),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(temporal_flash_attention(*a, None, heads=H) * g),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_temporal_kernel_gradients_with_mask():
    rng = np.random.default_rng(2)
    B, N, F, C, H = 1, 128, 4, 32, 2
    q = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    mask = causal_temporal_mask("causal", F)

    gr = jax.grad(lambda *a: jnp.sum(einsum_reference(*a, mask, H) * g),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(temporal_flash_attention(*a, mask, heads=H) * g),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )
