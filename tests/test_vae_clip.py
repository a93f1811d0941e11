"""Shape/behavior smoke tests for the VAE and CLIP text encoder (weight-level
parity is exercised by the checkpoint-import tests with synthetic torch
state dicts)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu.models.vae import AutoencoderKL, VAEConfig
from cvd_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig

TINY_VAE = VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8)


@pytest.fixture(scope="module")
def tiny_vae():
    vae = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = vae.init(jax.random.key(0), x, jax.random.key(1))
    return vae, params


def test_vae_encode_decode_shapes(tiny_vae):
    vae, params = tiny_vae
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
    mean, logvar = vae.apply(params, x, method=vae.encode)
    assert mean.shape == (2, 4, 4, 4) and logvar.shape == mean.shape  # /8 spatial
    img = vae.apply(params, mean, method=vae.decode)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_vae_posterior_sampling_uses_rng(tiny_vae):
    vae, params = tiny_vae
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)), jnp.float32)
    z1 = vae.apply(params, x, jax.random.key(2), method=vae.sample_posterior)
    z2 = vae.apply(params, x, jax.random.key(3), method=vae.sample_posterior)
    assert np.abs(np.asarray(z1 - z2)).max() > 0


def test_clip_text_encoder_shapes_and_causality():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
                         intermediate_size=128)
    enc = CLIPTextEncoder(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 100, (2, 77)))
    params = enc.init(jax.random.key(4), ids)
    out = enc.apply(params, ids)
    assert out.shape == (2, 77, 64)
    # causality: changing a late token must not affect earlier positions
    ids2 = ids.at[:, 50].set((ids[:, 50] + 1) % 100)
    out2 = enc.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out[:, :50]), np.asarray(out2[:, :50]), atol=1e-5)
    assert np.abs(np.asarray(out[:, 50:] - out2[:, 50:])).max() > 1e-4
