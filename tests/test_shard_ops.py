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


@pytest.fixture(scope="module")
def data_mesh():
    from cvd_tpu.parallel import create_mesh

    return create_mesh(axis_names=("data",))  # the training mesh


def test_mesh_ok_for_kernels(mesh, data_mesh):
    assert mesh_ok_for_kernels(mesh, 4, 4)
    assert not mesh_ok_for_kernels(mesh, 3, 4)   # rows not divisible
    assert not mesh_ok_for_kernels(mesh, 4, 3)   # frames not divisible
    assert not mesh_ok_for_kernels(None, 4, 4)
    # training mesh: whole videos per device; frames never sharded
    assert mesh_ok_for_kernels(data_mesh, 8, 3)
    assert not mesh_ok_for_kernels(data_mesh, 6, 4)


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


# ----------------------------------------------- training ("data",) mesh

def test_sharded_spatial_data_mesh(data_mesh):
    rng = np.random.default_rng(10)
    B, N, C, H = 8, 256, 32, 2
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
               for _ in range(3))
    ref = flash_attention(q, k, v, heads=H)
    got = jax.jit(
        lambda q, k, v: sharded_spatial_flash(q, k, v, H, data_mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_temporal_data_mesh(data_mesh):
    from cvd_tpu.models.motion import causal_temporal_mask

    rng = np.random.default_rng(11)
    B, N, F, C, H = 8, 128, 4, 32, 2
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, F, C)), jnp.float32)
               for _ in range(3))
    mask = causal_temporal_mask("causal", F)
    ref = temporal_flash_attention(q, k, v, mask, heads=H)
    got = jax.jit(
        lambda q, k, v: sharded_temporal_flash(q, k, v, mask, H, data_mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _epi_data_mesh_inputs(Bv, Fw, feat=16, H=2, D=16, S=256, seed=12):
    rng = np.random.default_rng(seed)
    B, N, C = Bv * Fw, feat * feat, H * D
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
               for _ in range(3))
    F = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    coords = pixel_grid_coords(feat, S)
    nl, band, alpha = lines_and_band(epipolar_lines(F, coords), feat, S)
    cxy = coords[:, :2].T
    # training chunk-swap routing: partner video, same frame — the partner
    # sits Bv/2 videos away, i.e. on a DIFFERENT device shard
    b_partner = np.roll(np.arange(Bv), Bv // 2)
    route = jnp.asarray(
        (b_partner[:, None] * Fw + np.arange(Fw)[None, :]).reshape(-1),
        jnp.int32,
    )
    return q, k, v, nl, band, alpha, cxy, route


def test_sharded_epi_data_mesh(data_mesh):
    Bv, Fw, H = 8, 2, 2
    q, k, v, nl, band, alpha, cxy, route = _epi_data_mesh_inputs(Bv, Fw)
    ref = epi_flash_attention(q, k, v, nl, cxy, band, alpha, heads=H,
                              kv_index=route)
    got = jax.jit(
        lambda q, k, v: sharded_epi_flash(
            q, k, v, nl, cxy, band, alpha, H, route, Fw, data_mesh)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_epi_data_mesh_grad(data_mesh):
    """dk/dv must scatter back across the batch shard: the sharded wrapper
    all-gathers k/v over 'data', so its backward is the kernel vjp composed
    with the all-gather transpose (psum_scatter). Compare the full gradient
    against the single-device kernel's."""
    Bv, Fw, H = 8, 2, 2
    q, k, v, nl, band, alpha, cxy, route = _epi_data_mesh_inputs(Bv, Fw)
    w = jnp.asarray(
        np.random.default_rng(13).standard_normal(q.shape), jnp.float32
    )

    def loss_single(q, k, v):
        out = epi_flash_attention(q, k, v, nl, cxy, band, alpha, heads=H,
                                  kv_index=route)
        return jnp.sum(out * w)

    def loss_sharded(q, k, v):
        out = sharded_epi_flash(q, k, v, nl, cxy, band, alpha, H, route,
                                Fw, data_mesh)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"d{name} mismatch",
        )


def test_epi_module_sharded_train_dispatch_grads(data_mesh):
    """The mesh train step's dispatch end-to-end at module level: with
    SHARD_MESH set to the ("data",) training mesh, EpiSelfAttention must
    route through sharded_epi_flash and produce the same output AND
    parameter/input gradients as the unsharded kernel path."""
    from cvd_tpu.models import layers as _layers
    from cvd_tpu.models.epi import EpiConditioning, EpiSelfAttention

    Bv, Fw, feat, C, H = 8, 2, 16, 32, 4
    B, N = Bv * Fw, feat * feat
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    F_mats = jnp.asarray(rng.standard_normal((B, 3, 3)) * 1e-3, jnp.float32)
    cond = EpiConditioning(
        F_mats=F_mats, video_length=Fw, F_mat_size=256,
        rand_slope_ff=False, cfg_factor=1, use_flash_kernel=True,
    )
    mod = EpiSelfAttention(dim=C, heads=H)
    variables = mod.init(jax.random.key(0), x, cond)

    def loss(v_, x_):
        out, _ = mod.apply(v_, x_, cond)
        return jnp.sum(out ** 2)

    prev = (_layers.FLASH_SPATIAL, _layers.SHARD_MESH)
    try:
        _layers.FLASH_SPATIAL, _layers.SHARD_MESH = True, None
        ref_l, (ref_gv, ref_gx) = jax.value_and_grad(loss, argnums=(0, 1))(
            variables, x)
        _layers.SHARD_MESH = data_mesh
        got_l, (got_gv, got_gx) = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1)))(variables, x)
    finally:
        _layers.FLASH_SPATIAL, _layers.SHARD_MESH = prev

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               rtol=2e-4, atol=2e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_gv)
    flat_got = jax.tree_util.tree_leaves(got_gv)
    for a, b in zip(flat_got, flat_ref):
        # f32 accumulation order differs across shards (psum_scatter of
        # dk/dv vs a single-device scatter-add) — allow ~1e-3 relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
