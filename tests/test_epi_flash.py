"""Pallas fused epipolar attention vs the XLA materialized-bias reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu.geometry.epipolar_mask import (
    epipolar_attn_bias_from_lines,
    epipolar_lines,
    lines_and_band,
    pixel_grid_coords,
)
from cvd_tpu.ops.attention import attention_with_bias
from cvd_tpu.ops.epi_flash import epi_flash_attention


@pytest.mark.parametrize("feat,heads,dim", [(16, 4, 32), (32, 2, 40)])
def test_flash_matches_xla_reference(feat, heads, dim):
    rng = np.random.default_rng(0)
    B, N = 4, feat * feat
    S = 256
    q = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)

    coords = pixel_grid_coords(feat, S)
    lines = epipolar_lines(F, coords)

    bias = epipolar_attn_bias_from_lines(lines, coords, feat, S)
    ref = attention_with_bias(q, k, v, bias)

    norm_lines, band, alpha = lines_and_band(lines, feat, S)
    got = epi_flash_attention(q, k, v, norm_lines, coords, band, alpha, q_tile=128)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_path_in_epi_module_matches_xla_path():
    from cvd_tpu.models.epi import EpiConditioning, EpiTransformer

    mod = EpiTransformer(in_channels=32, heads=4, norm_groups=8, zero_initialize=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 32)), jnp.float32)
    F_mats = jnp.asarray(rng.standard_normal((4, 3, 3)) * 1e-3, jnp.float32)
    cond_xla = EpiConditioning(F_mats=F_mats, video_length=2, rand_slope_ff=False)
    cond_flash = EpiConditioning(
        F_mats=F_mats, video_length=2, rand_slope_ff=False, use_flash_kernel=True
    )
    params = mod.init(jax.random.key(0), x, cond_xla)
    out_xla, _ = mod.apply(params, x, cond_xla)
    out_flash, _ = mod.apply(params, x, cond_flash)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), rtol=2e-3, atol=2e-3
    )


def test_flash_gradients_match_xla_reference():
    rng = np.random.default_rng(2)
    feat, heads, dim = 16, 2, 32
    B, N, S = 2, 16 * 16, 256
    q = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)

    coords = pixel_grid_coords(feat, S)
    lines = epipolar_lines(F, coords)
    bias = epipolar_attn_bias_from_lines(lines, coords, feat, S)
    norm_lines, band, alpha = lines_and_band(lines, feat, S)

    def loss_ref(q, k, v):
        return jnp.sum(attention_with_bias(q, k, v, jax.lax.stop_gradient(bias)) * g)

    def loss_flash(q, k, v):
        return jnp.sum(
            epi_flash_attention(q, k, v, norm_lines, coords, band, alpha, q_tile=128) * g
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_flash_geometry_inputs_get_zero_grads():
    rng = np.random.default_rng(3)
    feat, heads, dim = 16, 1, 16
    B, N, S = 1, 16 * 16, 256
    q = jnp.asarray(rng.standard_normal((B, heads, N, dim)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    coords = pixel_grid_coords(feat, S)
    lines = epipolar_lines(F, coords)
    norm_lines, band, alpha = lines_and_band(lines, feat, S)

    def loss(nl, bd, al):
        return jnp.sum(epi_flash_attention(q, q, q, nl, coords, bd, al, q_tile=128))

    gl, gb, ga = jax.grad(loss, argnums=(0, 1, 2))(norm_lines, band, alpha)
    assert float(jnp.abs(gl).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0
    assert float(jnp.abs(ga).max()) == 0.0


def test_plain_flash_matches_xla_and_grads():
    from cvd_tpu.ops.epi_flash import flash_attention

    rng = np.random.default_rng(5)
    B, H, L, D = 2, 3, 256, 24
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, 2 * L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, 2 * L, D)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)

    ref = attention_with_bias(q, k, v, None)
    got = flash_attention(q, k, v, q_tile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    gr = jax.grad(lambda *a: jnp.sum(attention_with_bias(*a, None) * g),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda *a: jnp.sum(flash_attention(*a, q_tile=128) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )
