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
