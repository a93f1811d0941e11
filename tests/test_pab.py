"""Pyramid Attention Broadcast (pipelines/pab.py + the "pab" variable
collection threaded through models/{layers,motion,epi}.py and the simple
pipeline's sampling scan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvd_tpu.pipelines.pab import CLASSES, PABConfig, reuse_masks


# ------------------------------------------------------------- schedules
def test_reuse_masks_step0_and_window_boundaries_compute():
    cfg = PABConfig(spatial=2, cross=3, temporal=4, epi=2,
                    start_frac=0.2, end_frac=0.9)
    masks = reuse_masks(25, cfg)
    lo, hi = 5, 22  # round(25*0.2), round(25*0.9)
    for name in CLASSES:
        m = masks[name]
        assert m.shape == (25,) and m.dtype == bool
        assert not m[0]  # a zero-initialized cache is never consumed
        assert not m[:lo].any() and not m[hi:].any()
        r = getattr(cfg, name)
        for i in range(lo, hi):
            assert m[i] == ((i - lo) % r != 0)


def test_reuse_masks_range_one_disables_class():
    masks = reuse_masks(25, PABConfig(spatial=1, cross=1, temporal=1, epi=1))
    assert not any(masks[c].any() for c in CLASSES)


def test_pab_config_from_string():
    cfg = PABConfig.from_string("spatial=4,epi=2")
    assert cfg.spatial == 4 and cfg.epi == 2
    assert cfg.cross == PABConfig.cross and cfg.temporal == PABConfig.temporal
    with pytest.raises(ValueError):
        PABConfig.from_string("bogus=3")


# ------------------------------------------------- attention-site caching
def test_attention_site_reuses_cached_output():
    from cvd_tpu.models.layers import Attention

    attn = Attention(query_dim=16, heads=2, dim_head=8)
    x1 = jax.random.normal(jax.random.key(0), (2, 12, 16))
    x2 = jax.random.normal(jax.random.key(1), (2, 12, 16))
    params = attn.init(jax.random.key(2), x1)

    compute = jnp.zeros((), bool)
    reuse = jnp.ones((), bool)
    out1, mut = attn.apply(params, x1, pab_reuse=compute, mutable=["pab"])
    # reuse step: different input, cached output comes back verbatim
    out2, mut2 = attn.apply({**params, **mut}, x2, pab_reuse=reuse,
                            mutable=["pab"])
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # compute step: the new input actually runs
    out3, _ = attn.apply({**params, **mut2}, x2, pab_reuse=compute,
                         mutable=["pab"])
    assert float(jnp.abs(out3 - out1).max()) > 0
    # and matches the no-PAB forward (to reassociation: the cond-wrapped
    # closure and the direct call compile as different XLA programs)
    ref = attn.apply(params, x2)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_temporal_site_reuses_cached_output():
    from cvd_tpu.models.motion import TemporalSelfAttention

    mod = TemporalSelfAttention(dim=16, heads=2, pe_max_len=8)
    x1 = jax.random.normal(jax.random.key(0), (2, 9, 4, 16))
    x2 = jax.random.normal(jax.random.key(1), (2, 9, 4, 16))
    params = mod.init(jax.random.key(2), x1)
    out1, mut = mod.apply(params, x1, pab_reuse=jnp.zeros((), bool),
                          mutable=["pab"])
    out2, _ = mod.apply({**params, **mut}, x2, pab_reuse=jnp.ones((), bool),
                        mutable=["pab"])
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_epi_site_reuses_cached_output_and_zeroes_aux():
    from cvd_tpu.models.epi import EpiSelfAttention

    mod = EpiSelfAttention(dim=16, heads=2)
    x1 = jax.random.normal(jax.random.key(0), (4, 16, 16))
    x2 = jax.random.normal(jax.random.key(1), (4, 16, 16))
    params = mod.init(jax.random.key(2), x1, None)
    (out1, qk1), mut = mod.apply(params, x1, None,
                                 pab_reuse=jnp.zeros((), bool),
                                 mutable=["pab"])
    (out2, qk2), _ = mod.apply({**params, **mut}, x2, None,
                               pab_reuse=jnp.ones((), bool),
                               mutable=["pab"])
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # PAB is inference-only: aux q/k maps come back as zeros
    assert not np.asarray(qk1["query"]).any()
    assert not np.asarray(qk2["key"]).any()


def test_unet_rejects_pab_with_scan_dedup():
    import dataclasses

    from tests.tiny import TINY_UNET
    from cvd_tpu.models.unet import UNet3DConditionModel

    cfg = dataclasses.replace(TINY_UNET, scan_identical_layers=True)
    unet = UNet3DConditionModel(cfg)
    with pytest.raises(ValueError, match="scan_identical_layers"):
        unet.apply(
            {"params": {}}, jnp.zeros((2, 2, 8, 8, 4)), jnp.zeros(()),
            jnp.zeros((2, 77, 24)),
            pab={c: jnp.zeros((), bool) for c in CLASSES},
        )


# ----------------------------------------------------- pipeline (slow-ish)
@pytest.fixture(scope="module")
def pipe_inputs():
    from cvd_tpu import geometry as G

    F, IMG = 4, 64
    rng = np.random.default_rng(0)
    ids = jnp.zeros((1, 77), jnp.int32)
    neg = jnp.ones((1, 77), jnp.int32)
    plucker = jnp.asarray(rng.standard_normal((2, F, IMG, IMG, 6)),
                          jnp.float32)
    eye4 = jnp.tile(jnp.eye(4)[None, None], (2, F, 1, 1))
    eye3 = jnp.tile(jnp.eye(3)[None, None], (2, F, 1, 1))
    Fm = G.fundamental_between_views(eye4[0], eye4[1], eye3[0], eye3[1])
    F_mats = jnp.stack([Fm, jnp.swapaxes(Fm, -1, -2)])
    return ids, neg, plucker, F_mats, IMG


@pytest.mark.slow
def test_pab_ranges_one_is_bitwise_baseline(pipe_inputs):
    """The PAB machinery with every range at 1 (never reuse) must reproduce
    the plain sampling loop exactly — the lax.cond false-branches compute
    the identical program."""
    from tests.tiny import tiny_modules
    from cvd_tpu.pipelines.simple import SimplePipeline

    ids, neg, plucker, F_mats, IMG = pipe_inputs
    pipe = SimplePipeline(tiny_modules(latent_size=8, video_length=4),
                          F_mat_size=IMG, use_flash_kernel=False)
    kw = dict(num_inference_steps=4, rng=jax.random.key(1), decode=False)
    base = pipe(ids, neg, plucker, F_mats, **kw)
    same = pipe(ids, neg, plucker, F_mats, **kw,
                pab_config=PABConfig(spatial=1, cross=1, temporal=1, epi=1))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))


@pytest.mark.slow
def test_pab_active_runs_and_engages(pipe_inputs):
    from tests.tiny import tiny_modules
    from cvd_tpu.pipelines.simple import SimplePipeline

    ids, neg, plucker, F_mats, IMG = pipe_inputs
    pipe = SimplePipeline(tiny_modules(latent_size=8, video_length=4),
                          F_mat_size=IMG, use_flash_kernel=False)
    kw = dict(num_inference_steps=4, rng=jax.random.key(1), decode=False)
    base = pipe(ids, neg, plucker, F_mats, **kw)
    on = pipe(ids, neg, plucker, F_mats, **kw,
              pab_config=PABConfig(spatial=2, cross=2, temporal=2, epi=2,
                                   start_frac=0.25, end_frac=1.0))
    assert bool(jnp.isfinite(on).all())
    # caching engaged: the trajectory must actually diverge from baseline
    assert float(jnp.abs(on - base).max()) > 0


# ------------------------------------------------- advanced pipeline (slow)
@pytest.fixture(scope="module")
def adv_inputs():
    from cvd_tpu import geometry as G
    from cvd_tpu.geometry.trajectories import default_intrinsics

    V, F, IMG = 2, 4, 64
    c2ws = G.circle_trajectory(V, F, camera_dist=0.3)
    K = default_intrinsics(V, F, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None],
        jnp.asarray(c2ws, jnp.float32)[None], IMG, IMG,
    )[0].reshape(V, F, IMG, IMG, 6)
    ids = jnp.zeros((1, 77), jnp.int32)
    neg = jnp.ones((1, 77), jnp.int32)
    return (ids, neg, plucker, jnp.asarray(c2ws, jnp.float32),
            jnp.asarray(K, jnp.float32), IMG)


@pytest.mark.slow
def test_pab_advanced_ranges_one_is_bitwise_baseline(adv_inputs):
    """Advanced pipeline: PAB with every range at 1 (never reuse) must be
    bitwise-identical to the plain multistep/accumulate sampling scan."""
    from tests.tiny import tiny_modules
    from cvd_tpu.pipelines.advanced import AdvancedPipeline

    ids, neg, plucker, c2w, K, IMG = adv_inputs
    pipe = AdvancedPipeline(tiny_modules(latent_size=8, video_length=4),
                            F_mat_size=IMG)
    kw = dict(c2w=c2w, K_mats=K, num_inference_steps=3, multistep=2,
              accumulate_step=2, rng=jax.random.key(5), decode=False)
    base = pipe(ids, neg, jnp.copy(plucker), **kw)
    same = pipe(ids, neg, jnp.copy(plucker), **kw,
                pab_config=PABConfig(spatial=1, cross=1, temporal=1, epi=1))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))


@pytest.mark.slow
def test_pab_advanced_active_chunk_threads_cache(adv_inputs):
    """Advanced pipeline with PAB engaged: the whole-run program and the
    host-chunked (step_chunk) execution must agree bitwise — the attention
    cache threads across chunk executions — and must actually diverge from
    the no-PAB baseline (caching engaged)."""
    from tests.tiny import tiny_modules
    from cvd_tpu.pipelines.advanced import AdvancedPipeline

    ids, neg, plucker, c2w, K, IMG = adv_inputs
    pipe = AdvancedPipeline(tiny_modules(latent_size=8, video_length=4),
                            F_mat_size=IMG)
    cfg = PABConfig(spatial=2, cross=2, temporal=2, epi=2,
                    start_frac=0.25, end_frac=1.0)
    kw = dict(c2w=c2w, K_mats=K, num_inference_steps=4, multistep=2,
              accumulate_step=2, rng=jax.random.key(5), decode=False)
    base = pipe(ids, neg, jnp.copy(plucker), **kw)
    on = pipe(ids, neg, jnp.copy(plucker), **kw, pab_config=cfg)
    chunked = pipe(ids, neg, jnp.copy(plucker), **kw, pab_config=cfg,
                   step_chunk=3)
    assert bool(jnp.isfinite(on).all())
    assert float(jnp.abs(on - base).max()) > 0
    np.testing.assert_array_equal(np.asarray(on), np.asarray(chunked))
