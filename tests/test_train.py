"""Training-step tests: freeze mask, loss behavior, and the data-parallel
mesh path on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from cvd_tpu.parallel import create_mesh, replicate, shard_batch
from cvd_tpu.train.losses import epi_distance_loss, masked_mse_loss
from cvd_tpu.train.state import create_train_state, trainable_mask
from cvd_tpu.train.train_step import make_jitted_train_step, train_step

from tiny import tiny_modules

pytestmark = pytest.mark.slow

F_FRAMES = 2
IMG = 64


@pytest.fixture(scope="module")
def modules():
    return tiny_modules(latent_size=8, video_length=F_FRAMES)


def make_batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "latents": jnp.asarray(rng.standard_normal((B, F_FRAMES, 8, 8, 4)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(0, 49408, (B, 77)), jnp.int32),
        "plucker": jnp.asarray(
            rng.standard_normal((B, F_FRAMES, IMG, IMG, 6)), jnp.float32
        ),
        "F_mats": jnp.asarray(
            rng.standard_normal((B, F_FRAMES, 3, 3)) * 1e-3, jnp.float32
        ),
    }


def test_trainable_mask_selects_epi_and_merge():
    m = tiny_modules(8, F_FRAMES)
    mask = trainable_mask(m.unet_params)
    flat = traverse_util.flatten_dict(mask["params"])
    on = [k for k, v in flat.items() if v]
    off = [k for k, v in flat.items() if not v]
    assert all("epi_modules" in "/".join(k) for k in on)
    assert any("motion_modules" in "/".join(k) for k in off)
    assert len(on) > 50


def test_train_step_updates_only_trainable(modules):
    state = create_train_state(modules.unet_params, learning_rate=1e-3)
    before = traverse_util.flatten_dict(state.params["params"])
    before = {k: np.asarray(v).copy() for k, v in before.items()}
    new_state, metrics = jax.jit(
        lambda s, b, k: train_step(s, b, modules, k), donate_argnums=()
    )(state, make_batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    after = traverse_util.flatten_dict(new_state.params["params"])
    changed = {k for k in after if not np.allclose(before[k], np.asarray(after[k]))}
    assert changed, "no params updated"
    assert all("epi_modules" in "/".join(k) for k in changed), (
        f"non-epi params changed: {list(changed)[:3]}"
    )
    # epi proj_out is zero-init -> gradients flow into epi attention weights
    assert any("to_q" in "/".join(k) or "proj_out" in "/".join(k) for k in changed)


def test_train_step_data_parallel_mesh(modules):
    mesh = create_mesh(axis_names=("data",))
    assert mesh.devices.size == 8
    # copy params: the jitted step donates the state, and replication may
    # alias the device-0 shard with the shared fixture buffers
    params_copy = jax.tree_util.tree_map(jnp.copy, modules.unet_params)
    state = create_train_state(params_copy, learning_rate=1e-3)
    state = replicate(state, mesh)
    batch = shard_batch(make_batch(B=8), mesh)
    step = make_jitted_train_step(modules, mesh)
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    # loss must equal the single-device computation on the same batch
    state2 = create_train_state(modules.unet_params, learning_rate=1e-3)
    _, metrics2 = jax.jit(lambda s, b, k: train_step(s, b, modules, k))(
        state2, make_batch(B=8), jax.random.key(1)
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-4
    )


def make_unposed_batch(B=2, seed=0, mask_value=None):
    """WebVid-style batch: H_mats + warped_masks, no plucker/F_mats
    (train_epi_control.py:532-545)."""
    rng = np.random.default_rng(seed)
    H = np.tile(np.eye(3, dtype=np.float32), (B, F_FRAMES, 1, 1))
    H[..., 0, 2] = rng.standard_normal((B, F_FRAMES)) * 3
    masks = (
        np.full((B, F_FRAMES, 8, 8, 1), mask_value, np.float32)
        if mask_value is not None
        else (rng.random((B, F_FRAMES, 8, 8, 1)) > 0.3).astype(np.float32)
    )
    return {
        "latents": jnp.asarray(rng.standard_normal((B, F_FRAMES, 8, 8, 4)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(0, 49408, (B, 77)), jnp.int32),
        "H_mats": jnp.asarray(H),
        "warped_masks": jnp.asarray(masks),
    }


def test_train_step_unposed_batch(modules):
    """Pose-free batches train through the H_mats pseudo-epipolar path with
    zero pose conditioning and image-LoRA scale 0 (train_epi_control.py:580)."""
    state = create_train_state(modules.unet_params, learning_rate=1e-3)
    before = traverse_util.flatten_dict(state.params["params"])
    before = {k: np.asarray(v).copy() for k, v in before.items()}
    new_state, metrics = jax.jit(
        lambda s, b, k: train_step(s, b, modules, k), donate_argnums=()
    )(state, make_unposed_batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) > 0
    after = traverse_util.flatten_dict(new_state.params["params"])
    changed = {k for k in after if not np.allclose(before[k], np.asarray(after[k]))}
    assert changed and all("epi_modules" in "/".join(k) for k in changed)


def test_train_step_unposed_mask_reaches_loss(modules):
    """warped_masks actually gate the MSE: an all-zero mask zeroes the loss
    (no epi aux term at additional_channel=0)."""
    state = create_train_state(modules.unet_params, learning_rate=1e-3)
    _, metrics = jax.jit(
        lambda s, b, k: train_step(s, b, modules, k), donate_argnums=()
    )(state, make_unposed_batch(mask_value=0.0), jax.random.key(0))
    assert float(metrics["loss"]) == 0.0
    _, metrics_full = jax.jit(
        lambda s, b, k: train_step(s, b, modules, k), donate_argnums=()
    )(state, make_unposed_batch(mask_value=1.0), jax.random.key(0))
    assert float(metrics_full["loss"]) > 0


def test_masked_mse():
    pred = jnp.ones((2, 4))
    tgt = jnp.zeros((2, 4))
    mask = jnp.asarray([[1.0, 1, 0, 0], [0, 0, 0, 0]])
    assert float(masked_mse_loss(pred, tgt, mask)) == pytest.approx(2 / 8)


def test_epi_distance_loss_prefers_on_line_correspondences():
    # keys identical to queries at pixel-aligned positions -> soft argmax sits
    # at the query pixel; identity-ish F whose epipolar line passes through
    # the pixel gives near-zero loss, a shifted line gives larger loss
    rng = np.random.default_rng(0)
    B, F, h = 1, 1, 8
    C = 16
    qk = rng.standard_normal((B, F, h, h, C)).astype(np.float32) * 5
    aux = jnp.asarray(np.concatenate([qk, qk], -1))
    # line through own pixel: horizontal line y = y_q -> F built s.t. l = (0,-1,y)
    # use pseudo path instead: compare two translations
    F_good = np.zeros((1, 3, 3), np.float32)
    F_good[:, 1, 2] = -1.0  # l = F x = (0, -1*1?, ...)
    # l_q = F @ (x, y, 1) = (0, -1, ?) rows: row0=0, row1 = -1 (z comp) ...
    F_good[:, 0, :] = [0, 0, 0]
    F_good = np.array([[[0, 0, 0], [0, 0, -1], [0, 1, 0]]], np.float32)
    # l = F @ p = (0, -1, y) -> line y' = y passes through matched pixel
    F_bad = np.array([[[0, 0, 0], [0, 0, -1], [0, 1, 100.0]]], np.float32)
    good = float(epi_distance_loss(aux, jnp.asarray(F_good), 256))
    bad = float(epi_distance_loss(aux, jnp.asarray(F_bad), 256))
    assert good < bad
    assert good < 0.05


def test_train_state_frozen_dtype_mixed_precision(modules):
    """frozen_dtype=bf16: frozen leaves stored bf16, trainable leaves f32
    masters; one step still updates only the trainable set and keeps the
    frozen leaves bit-identical (set_to_zero on bf16 adds nothing)."""
    import dataclasses as _dc

    from flax import traverse_util as _tu

    params_copy = jax.tree_util.tree_map(jnp.copy, modules.unet_params)
    state = create_train_state(
        params_copy, learning_rate=1e-3, frozen_dtype=jnp.bfloat16
    )
    mask = _tu.flatten_dict(
        trainable_mask(state.params)["params"]
        if "params" in state.params else trainable_mask(state.params)
    )
    flat = _tu.flatten_dict(
        state.params["params"] if "params" in state.params else state.params
    )
    for k, v in flat.items():
        want = jnp.float32 if mask[k] else jnp.bfloat16
        assert v.dtype == want, f"{k}: {v.dtype} != {want}"

    live = _dc.replace(modules, unet_params=state.params)
    new_state, metrics = jax.jit(
        lambda s, b, k: train_step(s, b, live, k), donate_argnums=()
    )(state, make_batch(), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    before = _tu.flatten_dict(
        state.params["params"] if "params" in state.params else state.params
    )
    after = _tu.flatten_dict(
        new_state.params["params"]
        if "params" in new_state.params else new_state.params
    )
    changed = {k for k in after if not np.array_equal(
        np.asarray(before[k]), np.asarray(after[k]))}
    assert changed and all("epi_modules" in "/".join(k) for k in changed)


def test_trainable_mask_matches_sync_lora_params():
    """With sync-LoRA enabled, the 'sync' trainable group matches REAL
    params (r04 verdict: the substring previously matched nothing). Also
    pins the effective-rank rule: rank<=16 -> channels // |image rank|
    (reference unet.py:1092 quirk)."""
    import dataclasses

    from cvd_tpu.models.epi import EpiConditioning
    from cvd_tpu.models.unet import UNet3DConditionModel, _sync_lora_rank
    from tiny import TINY_UNET

    cfg = dataclasses.replace(TINY_UNET, sync_lora_rank=4,
                              sync_lora_scale=1.0, spatial_lora_rank=-4)
    assert _sync_lora_rank(cfg, 64) == 16
    assert _sync_lora_rank(dataclasses.replace(cfg, sync_lora_rank=32), 64) == 32
    assert _sync_lora_rank(dataclasses.replace(cfg, sync_lora_scale=0.0), 64) == 0

    unet = UNet3DConditionModel(cfg)
    B, F, H, W = 2, 2, 16, 16
    cond = EpiConditioning(
        F_mats=jnp.zeros((B * F, 3, 3)), video_length=F, rand_slope_ff=False
    )
    params = unet.init(
        jax.random.key(0), jnp.zeros((B, F, H, W, 4)),
        jnp.zeros((B,), jnp.int32), jnp.zeros((B, 7, cfg.cross_attention_dim)),
        None, cond,
    )
    mask = trainable_mask(params)
    flat = traverse_util.flatten_dict(mask["params"])
    sync_on = [k for k, v in flat.items()
               if v and any("lora_sync" in el for el in k)]
    assert sync_on, "sync trainable group is empty"
    # 4 projections x {down,up} per pose-conditioned temporal attention
    assert len(sync_on) % 8 == 0
    # down kernel shape honors the per-layer rank at block 0 (32 ch / 4 = 8)
    pflat = traverse_util.flatten_dict(params["params"])
    down0 = next(v for k, v in pflat.items()
                 if "lora_sync" in "/".join(k) and k[-2] == "down"
                 and "down_blocks_0" in "/".join(k))
    assert down0.shape[-1] == 32 // 4


def test_train_step_latent_moments_batch(modules):
    """The latent_mean/latent_logvar (cache) batch path: one step runs,
    loss finite, and a tight posterior (logvar -> -inf) reproduces the
    plain pre-encoded-latents path exactly (same rng consumption)."""
    state = create_train_state(modules.unet_params, learning_rate=1e-3)
    b = make_batch()
    mean = b.pop("latents")
    batch = dict(b, latent_mean=mean / 0.18215,
                 latent_logvar=jnp.full(mean.shape, -1e9, jnp.float32))
    _, metrics = jax.jit(
        lambda s, bb, k: train_step(s, bb, modules, k), donate_argnums=()
    )(state, batch, jax.random.key(0))
    loss_moments = float(metrics["loss"])
    assert np.isfinite(loss_moments)
    state2 = create_train_state(modules.unet_params, learning_rate=1e-3)
    _, metrics2 = jax.jit(
        lambda s, bb, k: train_step(s, bb, modules, k), donate_argnums=()
    )(state2, dict(b, latents=mean), jax.random.key(0))
    # identical rng stream (vae_key unused in the latents path, used only
    # for the zero-width sample here) -> identical loss
    np.testing.assert_allclose(loss_moments, float(metrics2["loss"]), rtol=1e-5)
