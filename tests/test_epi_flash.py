"""Pallas fused epipolar attention vs the XLA materialized-bias reference.

The kernel works in the projections' native [B, N, C] token layout; the
XLA reference path uses the classic [B, H, N, D] head layout. Helpers
below convert between them.
"""
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
from cvd_tpu.ops.epi_flash import epi_flash_attention, flash_attention


def split_heads(x, heads):
    B, L, C = x.shape
    return x.reshape(B, L, heads, C // heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)


@pytest.mark.parametrize("feat,heads,dim", [(16, 4, 32), (32, 2, 40)])
def test_flash_matches_xla_reference(feat, heads, dim):
    rng = np.random.default_rng(0)
    B, N = 4, feat * feat
    S = 256
    C = heads * dim
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)

    coords = pixel_grid_coords(feat, S)
    lines = epipolar_lines(F, coords)

    bias = epipolar_attn_bias_from_lines(lines, coords, feat, S)
    ref = merge_heads(attention_with_bias(
        split_heads(q, heads), split_heads(k, heads), split_heads(v, heads),
        bias,
    ))

    norm_lines, band, alpha = lines_and_band(lines, feat, S)
    got = epi_flash_attention(
        q, k, v, norm_lines, coords[:, :2].T, band, alpha,
        heads=heads, q_tile=128,
    )

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_kv_routing_matches_explicit_gather():
    """kv_index routing == gathering k/v rows outside the kernel."""
    rng = np.random.default_rng(7)
    feat, heads, dim = 16, 2, 32
    B, N, S = 4, 16 * 16, 256
    C = heads * dim
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    coords = pixel_grid_coords(feat, S)
    norm_lines, band, alpha = lines_and_band(epipolar_lines(F, coords), feat, S)

    # the 2-view swap: rows [2,3,0,1]
    route = jnp.asarray([2, 3, 0, 1], jnp.int32)
    got = epi_flash_attention(
        q, k, v, norm_lines, coords[:, :2].T, band, alpha,
        heads=heads, kv_index=route, q_tile=128,
    )
    ref = epi_flash_attention(
        q, k[route], v[route], norm_lines, coords[:, :2].T, band, alpha,
        heads=heads, q_tile=128,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_kv_routing_gradients_scatter_back():
    rng = np.random.default_rng(8)
    feat, heads, dim = 16, 2, 16
    B, N, S = 4, 16 * 16, 256
    C = heads * dim
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    coords = pixel_grid_coords(feat, S)
    norm_lines, band, alpha = lines_and_band(epipolar_lines(F, coords), feat, S)
    route = jnp.asarray([1, 2, 3, 0], jnp.int32)

    def loss_routed(q, k, v):
        return jnp.sum(epi_flash_attention(
            q, k, v, norm_lines, coords[:, :2].T, band, alpha,
            heads=heads, kv_index=route, q_tile=128) * g)

    def loss_gathered(q, k, v):
        return jnp.sum(epi_flash_attention(
            q, k[route], v[route], norm_lines, coords[:, :2].T, band, alpha,
            heads=heads, q_tile=128) * g)

    # loss_gathered differentiates THROUGH the explicit gather, so its dk/dv
    # are already in source-row coordinates — the routed kernel's scatter-add
    # must reproduce them exactly.
    gr = jax.grad(loss_gathered, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_routed, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


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
    C = heads * dim
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)

    coords = pixel_grid_coords(feat, S)
    lines = epipolar_lines(F, coords)
    bias = epipolar_attn_bias_from_lines(lines, coords, feat, S)
    norm_lines, band, alpha = lines_and_band(lines, feat, S)

    def loss_ref(q, k, v):
        out = attention_with_bias(
            split_heads(q, heads), split_heads(k, heads), split_heads(v, heads),
            jax.lax.stop_gradient(bias),
        )
        return jnp.sum(merge_heads(out) * g)

    def loss_flash(q, k, v):
        return jnp.sum(
            epi_flash_attention(q, k, v, norm_lines, coords[:, :2].T, band,
                                alpha, heads=heads, q_tile=128) * g
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
    q = jnp.asarray(rng.standard_normal((B, N, heads * dim)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    coords = pixel_grid_coords(feat, S)
    lines = epipolar_lines(F, coords)
    norm_lines, band, alpha = lines_and_band(lines, feat, S)

    def loss(nl, bd, al):
        return jnp.sum(epi_flash_attention(
            q, q, q, nl, coords[:, :2].T, bd, al, heads=heads, q_tile=128))

    gl, gb, ga = jax.grad(loss, argnums=(0, 1, 2))(norm_lines, band, alpha)
    assert float(jnp.abs(gl).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0
    assert float(jnp.abs(ga).max()) == 0.0


def test_plain_flash_matches_xla_and_grads():
    rng = np.random.default_rng(5)
    B, H, L, D = 2, 3, 256, 24
    C = H * D
    q = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 2 * L, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 2 * L, C)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)

    def xla(q, k, v):
        return merge_heads(attention_with_bias(
            split_heads(q, H), split_heads(k, H), split_heads(v, H), None))

    ref = xla(q, k, v)
    got = flash_attention(q, k, v, heads=H, q_tile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)

    gr = jax.grad(lambda *a: jnp.sum(xla(*a) * g), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda *a: jnp.sum(flash_attention(*a, heads=H, q_tile=128) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )
