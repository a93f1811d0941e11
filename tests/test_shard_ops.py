"""Sharded shard_map kernel wrappers vs single-device kernels.

Runs on the virtual 8-device CPU mesh (kernels in interpret mode). The
wrappers must be bit-compatible with the unsharded kernels — the only
difference is where the data lives.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu.geometry.epipolar_mask import (
    epipolar_lines, lines_and_band, pixel_grid_coords,
)
from cvd_tpu.ops.epi_flash import epi_flash_attention, flash_attention
from cvd_tpu.ops.temporal_attn import temporal_flash_attention
from cvd_tpu.parallel import inference_mesh
from cvd_tpu.parallel.shard_ops import (
    mesh_ok_for_kernels,
    sharded_epi_flash,
    sharded_spatial_flash,
    sharded_temporal_flash,
)


@pytest.fixture(scope="module")
def mesh():
    return inference_mesh(8)  # ("rows","frames") = (4, 2)


def test_mesh_ok_for_kernels(mesh):
    assert mesh_ok_for_kernels(mesh, 4, 4)
    assert not mesh_ok_for_kernels(mesh, 3, 4)   # rows not divisible
    assert not mesh_ok_for_kernels(mesh, 4, 3)   # frames not divisible
    assert not mesh_ok_for_kernels(None, 4, 4)


def test_sharded_spatial_matches_single(mesh):
    rng = np.random.default_rng(0)
    B, N, C, H = 8, 256, 32, 2
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ref = flash_attention(q, k, v, heads=H)
    got = jax.jit(lambda q, k, v: sharded_spatial_flash(q, k, v, H, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sharded_temporal_matches_single(mesh):
    rng = np.random.default_rng(1)
    B, N, F, C, H = 4, 128, 4, 32, 2
    q = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    ref = temporal_flash_attention(q, k, v, None, heads=H)
    got = jax.jit(
        lambda q, k, v: sharded_temporal_flash(q, k, v, None, H, mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sharded_temporal_with_mask(mesh):
    from cvd_tpu.models.motion import causal_temporal_mask

    rng = np.random.default_rng(2)
    B, N, F, C, H = 4, 128, 4, 32, 2
    q = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
    mask = causal_temporal_mask("causal", F)
    ref = temporal_flash_attention(q, k, v, mask, heads=H)
    got = jax.jit(
        lambda q, k, v: sharded_temporal_flash(q, k, v, mask, H, mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rows", [4, 2])
@pytest.mark.parametrize("routing", ["swap", "random"])
@pytest.mark.parametrize("Bv", [4, 8, 12])
def test_sharded_epi_matches_single(routing, Bv, rows):
    # Bv=4 on (4,2): one video per row-shard (rows-only gather path);
    # Bv=8/12 on (4,2) and Bv=4/8/12 on (2,4): videos-per-row-shard > 1,
    # where the chunking splits videos across the frames axis and the
    # full both-axes gather path must kick in (the round-1 routing bug:
    # silently wrong kv rows for exactly these configs).
    mesh = inference_mesh(8, rows=rows)
    rng = np.random.default_rng(3)
    feat, H, D = 16, 2, 16
    Fw = 4
    B, N, S = Bv * Fw, feat * feat, 256
    C = H * D
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    coords = pixel_grid_coords(feat, S)
    nl, band, alpha = lines_and_band(epipolar_lines(F, coords), feat, S)
    cxy = coords[:, :2].T

    if routing == "swap":
        b_partner = np.roll(np.arange(Bv), Bv // 2)
    else:
        b_partner = np.asarray(
            np.random.default_rng(Bv).permutation(Bv))  # arbitrary pairing
    # global row routing: partner video, same frame
    route = jnp.asarray(
        (b_partner[:, None] * Fw + np.arange(Fw)[None, :]).reshape(-1),
        jnp.int32,
    )

    ref = epi_flash_attention(q, k, v, nl, cxy, band, alpha, heads=H,
                              kv_index=route)
    got = jax.jit(
        lambda q, k, v: sharded_epi_flash(
            q, k, v, nl, cxy, band, alpha, H, route, Fw, mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
