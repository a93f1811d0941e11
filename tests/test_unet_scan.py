"""scan_identical_layers equivalence: the apply-time layer-dedup scan
(UNetConfig.scan_identical_layers) must be numerically identical to the
unrolled forward with the SAME param tree — init layout and checkpoint
import are untouched by the flag.

Randomized epi slopes are the one documented divergence (the scan path
derives per-layer 'epi_slope' keys by explicit split instead of flax's
per-module-path derivation — statistically equivalent), so these tests pin
rand_slope_ff=False.
"""
import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # three full tiny-UNet compiles (~7 min/core)

import jax
import jax.numpy as jnp

from cvd_tpu.models.epi import EpiConditioning
from cvd_tpu.models.unet import UNet3DConditionModel, UNetConfig

B, F, S = 2, 2, 8
CFG = dict(
    block_out_channels=(32, 64, 64, 64), attention_heads=4,
    cross_attention_dim=24, norm_num_groups=8, motion_norm_groups=8,
    epi_norm_groups=8, motion_zero_initialize=False,
    epi_zero_initialize=False, dtype=jnp.float32,
)


def _inputs():
    rng = np.random.default_rng(7)
    ch = CFG["block_out_channels"]
    sample = jnp.asarray(rng.standard_normal((B, F, S, S, 4)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((B, 77, 24)), jnp.float32)
    pose = [jnp.asarray(
        rng.standard_normal((B, F, S // 2**i, S // 2**i, ch[i])) * 0.1,
        jnp.float32) for i in range(4)]
    F_mats = jnp.asarray(rng.standard_normal((B * F, 3, 3)) * 1e-3,
                         jnp.float32)
    cond = EpiConditioning(F_mats=F_mats, video_length=F,
                           rand_slope_ff=False, use_flash_kernel=False)
    t = jnp.asarray(500, jnp.int32)
    return sample, t, text, pose, cond


@pytest.mark.parametrize("remat", [False, True])
def test_unet_scan_layers_matches_unrolled(remat):
    sample, t, text, pose, cond = _inputs()
    cfg_off = UNetConfig(**CFG, remat=remat)
    cfg_on = dataclasses.replace(cfg_off, scan_identical_layers=True)
    unet_off = UNet3DConditionModel(cfg_off)
    unet_on = UNet3DConditionModel(cfg_on)
    params = unet_off.init(jax.random.key(0), sample, t, text, pose, cond)

    out_off, extras_off = unet_off.apply(params, sample, t, text, pose, cond)
    out_on, extras_on = unet_on.apply(params, sample, t, text, pose, cond)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-4, atol=1e-5)
    # auxiliary epi maps line up layer-for-layer
    a_off, a_on = extras_off["auxiliary"], extras_on["auxiliary"]
    if a_off is not None:
        assert len(a_off) == len(a_on)
        for d_off, d_on in zip(a_off, a_on):
            for k in d_off:
                np.testing.assert_allclose(np.asarray(d_on[k]),
                                           np.asarray(d_off[k]),
                                           rtol=1e-4, atol=1e-5,
                                           err_msg=f"aux {k}")


def test_unet_scan_layers_grads_match():
    """Gradients flow identically through stack->scan (training safety)."""
    sample, t, text, pose, cond = _inputs()
    cfg_off = UNetConfig(**CFG, remat=True)
    cfg_on = dataclasses.replace(cfg_off, scan_identical_layers=True)
    unet_off = UNet3DConditionModel(cfg_off)
    unet_on = UNet3DConditionModel(cfg_on)
    params = unet_off.init(jax.random.key(0), sample, t, text, pose, cond)

    def loss(p, unet):
        out, _ = unet.apply(p, sample, t, text, pose, cond)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_off = jax.grad(lambda p: loss(p, unet_off))(params)
    g_on = jax.grad(lambda p: loss(p, unet_on))(params)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    flat_on = dict(jax.tree_util.tree_leaves_with_path(g_on))
    assert len(flat_off) == len(flat_on)
    for path, leaf in flat_off:
        np.testing.assert_allclose(
            np.asarray(flat_on[path]), np.asarray(leaf),
            rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_unet_remat_unit_equivalence():
    """remat_unit='layer' (per-sublayer jax.checkpoint) must match both
    remat_unit='block' and no-remat exactly: remat changes scheduling,
    never math. Grads compared too (the whole point of remat is training)."""
    sample, t, text, pose, cond = _inputs()
    cfg_none = UNetConfig(**CFG, remat=False)
    cfg_layer = dataclasses.replace(cfg_none, remat=True, remat_unit="layer")
    cfg_block = dataclasses.replace(cfg_none, remat=True, remat_unit="block")
    unet_none = UNet3DConditionModel(cfg_none)
    params = unet_none.init(jax.random.key(0), sample, t, text, pose, cond)

    def loss(p, unet):
        out, _ = unet.apply(p, sample, t, text, pose, cond)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    ref = loss(params, unet_none)
    g_ref = jax.grad(lambda p: loss(p, unet_none))(params)
    for cfg in (cfg_layer, cfg_block):
        unet = UNet3DConditionModel(cfg)
        got = loss(params, unet)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6,
                                   err_msg=cfg.remat_unit)
        g = jax.grad(lambda p: loss(p, unet))(params)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g),
                                jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"{cfg.remat_unit}: {jax.tree_util.keystr(path)}")


def test_unet_remat_unit_validated():
    sample, t, text, pose, cond = _inputs()
    cfg = UNetConfig(**CFG, remat=True)
    cfg = dataclasses.replace(cfg, remat_unit="sublayer")
    unet = UNet3DConditionModel(cfg)
    with pytest.raises(ValueError, match="remat_unit"):
        unet.init(jax.random.key(0), sample, t, text, pose, cond)


def test_unet_remat_policy_equivalence_and_validation():
    """remat_policy='dots' (save matmul outputs, replay the rest) must
    match full remat exactly in loss AND grads — a checkpoint policy
    changes what the backward recomputes, never the math. Unknown policy
    names must raise, not silently fall back to full remat."""
    sample, t, text, pose, cond = _inputs()
    cfg_full = UNetConfig(**CFG, remat=True)
    unet_full = UNet3DConditionModel(cfg_full)
    params = unet_full.init(jax.random.key(0), sample, t, text, pose, cond)

    def loss(p, unet):
        out, _ = unet.apply(p, sample, t, text, pose, cond)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    ref = loss(params, unet_full)
    g_ref = jax.grad(lambda p: loss(p, unet_full))(params)
    for policy, unit in (("dots", "block"), ("dots", "layer"),
                         ("dots_small", "block")):
        cfg = dataclasses.replace(cfg_full, remat_policy=policy,
                                  remat_unit=unit)
        unet = UNet3DConditionModel(cfg)
        got = loss(params, unet)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-6,
                                   err_msg=f"{policy}/{unit}")
        g = jax.grad(lambda p: loss(p, unet))(params)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g),
                                jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"{policy}/{unit}: {jax.tree_util.keystr(path)}")

    bad = UNet3DConditionModel(
        dataclasses.replace(cfg_full, remat_policy="everything"))
    with pytest.raises(ValueError, match="remat_policy"):
        bad.apply(params, sample, t, text, pose, cond)
