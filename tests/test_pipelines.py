"""End-to-end pipeline tests on the tiny bundle (8x8 latents, 2 frames)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu import geometry as G
from cvd_tpu.geometry.trajectories import default_intrinsics
from cvd_tpu.io.tokenizer import HashTokenizer
from cvd_tpu.pipelines.advanced import AdvancedPipeline, random_pairing
from cvd_tpu.pipelines.simple import SimplePipeline

from tiny import tiny_modules

pytestmark = pytest.mark.slow

F_FRAMES = 2
IMG = 64  # latent 8


@pytest.fixture(scope="module")
def modules():
    return tiny_modules(latent_size=8, video_length=F_FRAMES)


@pytest.fixture(scope="module")
def camera_inputs():
    V = 2
    c2ws = G.circle_trajectory(V, F_FRAMES, camera_dist=0.3)
    K = default_intrinsics(V, F_FRAMES, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F_FRAMES, IMG, IMG, 6)
    F_pair = G.fundamental_between_views(
        jnp.asarray(c2ws[:F_FRAMES], jnp.float32),
        jnp.asarray(c2ws[F_FRAMES:], jnp.float32),
        jnp.asarray(K[:F_FRAMES], jnp.float32),
        jnp.asarray(K[F_FRAMES:], jnp.float32),
    )
    F_mats = jnp.stack([F_pair, jnp.swapaxes(F_pair, -1, -2)])  # [2, F, 3, 3]
    return plucker, F_mats, jnp.asarray(c2ws, jnp.float32), jnp.asarray(K, jnp.float32)


@pytest.fixture(scope="module")
def prompts():
    tok = HashTokenizer()
    return jnp.asarray(tok(["a scenic video"])), jnp.asarray(tok([""]))


def test_simple_pipeline_end_to_end(modules, camera_inputs, prompts):
    plucker, F_mats, _, _ = camera_inputs
    ids, neg = prompts
    pipe = SimplePipeline(modules)
    out = pipe(ids, neg, plucker, F_mats, num_inference_steps=3, rng=jax.random.key(0))
    assert out.shape == (2, F_FRAMES, IMG, IMG, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    # determinism
    out2 = pipe(ids, neg, plucker, F_mats, num_inference_steps=3, rng=jax.random.key(0))
    np.testing.assert_array_equal(o, np.asarray(out2))
    # different seed -> different video
    out3 = pipe(ids, neg, plucker, F_mats, num_inference_steps=3, rng=jax.random.key(1))
    assert np.abs(o - np.asarray(out3)).max() > 1e-4


def test_simple_pipeline_latents_only(modules, camera_inputs, prompts):
    plucker, F_mats, _, _ = camera_inputs
    ids, neg = prompts
    pipe = SimplePipeline(modules)
    lat = pipe(ids, neg, plucker, F_mats, num_inference_steps=2, decode=False)
    assert lat.shape == (2, F_FRAMES, 8, 8, 4)


def test_advanced_pipeline_two_view_fixed_pairs(modules, camera_inputs, prompts):
    plucker, F_mats, _, _ = camera_inputs
    ids, neg = prompts
    pipe = AdvancedPipeline(modules)
    out = pipe(ids, neg, plucker, F_mats=F_mats, num_inference_steps=2,
               rng=jax.random.key(2))
    assert out.shape == (2, F_FRAMES, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_advanced_pipeline_multiview_multistep(modules, prompts):
    V = 4
    c2ws = G.circle_trajectory(V, F_FRAMES, camera_dist=0.3)
    K = default_intrinsics(V, F_FRAMES, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F_FRAMES, IMG, IMG, 6)
    ids, neg = prompts
    pipe = AdvancedPipeline(modules)
    out = pipe(
        ids, neg, plucker,
        c2w=jnp.asarray(c2ws, jnp.float32), K_mats=jnp.asarray(K, jnp.float32),
        num_inference_steps=2, multistep=2, accumulate_step=2,
        rng=jax.random.key(3),
    )
    assert out.shape == (V, F_FRAMES, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_advanced_step_chunk_matches_whole_run(modules, prompts):
    """Host-driven chunked sampling (step_chunk) must be bitwise identical
    to the single whole-run program — the chunk boundary only splits the
    lax.scan xs (incl. a ragged final chunk: 3 steps at chunk 2)."""
    V = 4
    c2ws = G.circle_trajectory(V, F_FRAMES, camera_dist=0.3)
    K = default_intrinsics(V, F_FRAMES, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F_FRAMES, IMG, IMG, 6)
    ids, neg = prompts
    pipe = AdvancedPipeline(modules)
    kw = dict(c2w=jnp.asarray(c2ws, jnp.float32),
              K_mats=jnp.asarray(K, jnp.float32),
              num_inference_steps=3, multistep=2, accumulate_step=2,
              rng=jax.random.key(3), decode=False)
    full = pipe(ids, neg, jnp.copy(plucker), **kw)
    chunked = pipe(ids, neg, jnp.copy(plucker), **kw, step_chunk=2)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_advanced_pipeline_homography_path(modules, camera_inputs, prompts):
    plucker, _, _, _ = camera_inputs
    ids, neg = prompts
    H_mats = jnp.broadcast_to(jnp.eye(3), (2, F_FRAMES, 3, 3))
    pipe = AdvancedPipeline(modules)
    out = pipe(ids, neg, plucker, H_mats=H_mats, num_inference_steps=2,
               rng=jax.random.key(4))
    assert out.shape == (2, F_FRAMES, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_random_pairing_is_perfect_matching():
    for seed in range(5):
        partner = np.asarray(random_pairing(jax.random.key(seed), 6))
        assert (partner[partner] == np.arange(6)).all()
        assert (partner != np.arange(6)).all()


def test_simple_pipeline_multidiff_long_video(modules, prompts):
    # 2 windows of 2 frames with overlap 1 -> 3 total frames
    V, Fw, ov, steps = 2, 2, 1, 2
    F_total = 2 * (Fw - ov) + ov  # 3
    c2ws = G.circle_trajectory(V, F_total, camera_dist=0.3)
    from cvd_tpu.geometry.trajectories import default_intrinsics as DI

    K = DI(V, F_total, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F_total, IMG, IMG, 6)
    Fp = G.fundamental_between_views(
        jnp.asarray(c2ws[:F_total], jnp.float32), jnp.asarray(c2ws[F_total:], jnp.float32),
        jnp.asarray(K[:F_total], jnp.float32), jnp.asarray(K[F_total:], jnp.float32),
    )
    F_mats = jnp.stack([Fp, jnp.swapaxes(Fp, -1, -2)])
    ids, neg = prompts
    pipe = SimplePipeline(modules)
    out = pipe(
        ids, neg, plucker, F_mats, num_inference_steps=steps,
        rng=jax.random.key(7), multidiff_total_steps=2, multidiff_overlaps=ov,
        window_length=Fw,
    )
    assert out.shape == (2, F_total, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_simple_pipeline_sharded_matches_unsharded(modules, camera_inputs, prompts):
    """Sharded sampling over a ("rows","frames") mesh == single-device run."""
    from cvd_tpu.parallel import inference_mesh

    plucker, F_mats, _, _ = camera_inputs
    ids, neg = prompts
    ref = SimplePipeline(modules)(
        ids, neg, plucker, F_mats, num_inference_steps=2, rng=jax.random.key(3)
    )
    mesh = inference_mesh(8)  # 4 rows x 2 frames on the virtual CPU mesh
    assert mesh.shape == {"rows": 4, "frames": 2}
    pipe = SimplePipeline(modules, mesh=mesh)
    out = pipe(ids, neg, plucker, F_mats, num_inference_steps=2, rng=jax.random.key(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_advanced_pipeline_sharded_runs(modules, camera_inputs, prompts):
    from cvd_tpu.parallel import inference_mesh

    plucker, F_mats, c2ws, K = camera_inputs
    ids, neg = prompts
    mesh = inference_mesh(8)
    pipe = AdvancedPipeline(modules, mesh=mesh)
    out = pipe(
        ids, neg, plucker, F_mats=F_mats, num_inference_steps=2,
        rng=jax.random.key(1),
    )
    assert out.shape == (2, F_FRAMES, IMG, IMG, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_simple_pipeline_sharded_kernels_match_xla():
    """Sharded sampling with the Pallas kernels (shard_map wrappers) ==
    the XLA path, at shapes big enough to engage every kernel
    (spatial N=256, epi feat 16, temporal N=256)."""
    from cvd_tpu.parallel import inference_mesh
    from cvd_tpu.geometry.trajectories import default_intrinsics


    F_big, IMG_big = 4, 128
    mods = tiny_modules(latent_size=IMG_big // 8, video_length=F_big)
    c2ws = G.circle_trajectory(2, F_big, camera_dist=0.3)
    K = default_intrinsics(2, F_big, IMG_big, IMG_big)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None],
        jnp.asarray(c2ws, jnp.float32)[None], IMG_big, IMG_big,
    )[0].reshape(2, F_big, IMG_big, IMG_big, 6)
    Fp = G.fundamental_between_views(
        jnp.asarray(c2ws[:F_big], jnp.float32),
        jnp.asarray(c2ws[F_big:], jnp.float32),
        jnp.asarray(K[:F_big], jnp.float32),
        jnp.asarray(K[F_big:], jnp.float32),
    )
    F_mats = jnp.stack([Fp, jnp.swapaxes(Fp, -1, -2)])
    tok = HashTokenizer()
    ids = jnp.asarray(tok(["sharded kernels"]))
    neg = jnp.asarray(tok([""]))

    kw = dict(num_inference_steps=2, rng=jax.random.key(5), decode=False)
    ref = SimplePipeline(mods, F_mat_size=IMG_big, use_flash_kernel=False)(
        ids, neg, plucker, F_mats, **kw)
    mesh = inference_mesh(8)
    got = SimplePipeline(
        mods, F_mat_size=IMG_big, use_flash_kernel=True, mesh=mesh
    )(ids, neg, plucker, F_mats, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_advanced_accumulate_batched_matches_scan(modules, prompts):
    """accumulate_batched=True (one UNet call at batch 2V*acc) must produce
    the same latents as the inner-scan path: identical per-group pairings
    (same key schedule), deterministic slopes (rand_slope_ff=False)."""
    V = 4
    c2ws = G.circle_trajectory(V, F_FRAMES, camera_dist=0.3)
    K = default_intrinsics(V, F_FRAMES, IMG, IMG)
    intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
    plucker = G.ray_condition(
        jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
        IMG, IMG,
    )[0].reshape(V, F_FRAMES, IMG, IMG, 6)
    ids, neg = prompts
    kw = dict(
        c2w=jnp.asarray(c2ws, jnp.float32), K_mats=jnp.asarray(K, jnp.float32),
        num_inference_steps=2, multistep=2, accumulate_step=2,
        rng=jax.random.key(5), decode=False,
    )
    lat_scan = AdvancedPipeline(modules, rand_slope_ff=False)(
        ids, neg, jnp.copy(plucker), **kw)
    lat_batched = AdvancedPipeline(
        modules, rand_slope_ff=False, accumulate_batched=True
    )(ids, neg, jnp.copy(plucker), **kw)
    np.testing.assert_allclose(
        np.asarray(lat_batched), np.asarray(lat_scan), rtol=2e-4, atol=2e-4)
