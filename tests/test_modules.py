"""Module-level tests: motion/epi/pose-encoder/UNet behavior + torch parity
for the routing index gymnastics the reference does with tensor ops."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from cvd_tpu.models.epi import (
    EpiConditioning,
    EpiTransformer,
    gather_partner_tokens,
    regroup_bias,
)
from cvd_tpu.models.motion import TemporalTransformer
from cvd_tpu.models.pose_encoder import CameraPoseEncoder, pixel_unshuffle
from cvd_tpu.models.unet import UNet3DConditionModel, UNetConfig


def test_gather_partner_tokens_two_view_swap_matches_reference():
    # reference: chunk(2) then concat swapped (attention_processor.py:575-576)
    x = torch.randn(8, 5, 6)
    ref = torch.cat([x.chunk(2)[1], x.chunk(2)[0]], dim=0)
    got = gather_partner_tokens(jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(got), ref.numpy())


def test_gather_partner_tokens_kv_index_multigroup_matches_reference():
    B, N, C, m = 4, 3, 2, 2
    x = torch.randn(B, N, C)
    kv_index = torch.tensor([1, 0, 3, 2, 2, 3, 0, 1])  # m*B
    enc = x[kv_index]
    enc = enc.reshape(-1, B, N, C).permute(1, 2, 0, 3).reshape(B, -1, C)
    got = gather_partner_tokens(jnp.asarray(x.numpy()), jnp.asarray(kv_index.numpy()))
    np.testing.assert_allclose(np.asarray(got), enc.numpy())


def test_regroup_bias_matches_reference():
    B, N, m = 3, 4, 2
    mask = torch.randn(m * B, N, N)
    ref = mask.reshape(-1, B, N, N).permute(1, 2, 3, 0).reshape(B, N, -1)
    got = regroup_bias(jnp.asarray(mask.numpy()), B)
    np.testing.assert_allclose(np.asarray(got), ref.numpy())


def test_pixel_unshuffle_matches_torch():
    x = torch.randn(2, 6, 8, 8)
    ref = torch.nn.functional.pixel_unshuffle(x, 4)  # [2, 96, 2, 2]
    got = pixel_unshuffle(jnp.asarray(x.permute(0, 2, 3, 1).numpy()), 4)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6
    )


def test_epi_transformer_is_identity_at_init():
    # zero-initialized proj_out -> module output == input (epi_module.py:81-82)
    mod = EpiTransformer(in_channels=32, heads=4, norm_groups=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 2, 4, 4, 32)), jnp.float32)
    F_mats = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 3, 3)) * 1e-3, jnp.float32
    )
    cond = EpiConditioning(F_mats=F_mats, video_length=2, rand_slope_ff=False)
    params = mod.init(jax.random.key(0), x, cond)
    out, aux = mod.apply(params, x, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    assert len(aux) == 2 and set(aux[0]) == {"query", "key"}


def test_epi_cross_video_information_flow():
    # with non-zero proj_out, video A's output must depend on video B's input
    mod = EpiTransformer(in_channels=32, heads=4, norm_groups=8, zero_initialize=False)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 2, 4, 4, 32)), jnp.float32)
    F_mats = jnp.asarray(rng.standard_normal((8, 3, 3)) * 1e-3, jnp.float32)
    cond = EpiConditioning(F_mats=F_mats, video_length=2, rand_slope_ff=False)
    params = mod.init(jax.random.key(1), x, cond)
    out1, _ = mod.apply(params, x, cond)
    # perturb only video B rows (second half of batch); random noise so the
    # per-frame GroupNorm (shift-invariant) can't absorb it
    x2 = x.at[2:].add(jnp.asarray(rng.standard_normal(x[2:].shape), jnp.float32))
    out2, _ = mod.apply(params, x2, cond)
    delta_a = np.abs(np.asarray(out2[:2] - out1[:2])).max()
    assert delta_a > 1e-4, "video A output must change when video B changes"


def test_motion_module_cross_frame_mixing():
    # motion module attends across frames: perturbing frame 1 changes frame 0
    # (pixels within frame 1 also couple through the per-frame GroupNorm,
    # matching the reference's InflatedGroupNorm)
    mod = TemporalTransformer(in_channels=32, heads=4, norm_groups=8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 32)), jnp.float32)
    params = mod.init(jax.random.key(2), x, None)
    out1 = mod.apply(params, x, None)
    x2 = x.at[:, 1].add(jnp.asarray(rng.standard_normal(x[:, 1].shape), jnp.float32))
    out2 = mod.apply(params, x2, None)
    d = np.abs(np.asarray(out2 - out1))
    assert d[0, 0].max() > 1e-5  # frame 0 changed via temporal attention
    # residual path preserved: output differs from input only via the module
    np.testing.assert_array_equal(np.asarray(x[0, 2]), np.asarray(x2[0, 2]))


def test_motion_module_pose_conditioning_active():
    mod = TemporalTransformer(in_channels=32, heads=4, norm_groups=8)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 32)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((1, 4, 2, 2, 32)), jnp.float32)
    params = mod.init(jax.random.key(3), x, pose)
    # qkv_merge is zero-init -> pose has no effect at init
    out_nopose = mod.apply(params, x, None)
    out_pose = mod.apply(params, x, pose)
    np.testing.assert_allclose(np.asarray(out_pose), np.asarray(out_nopose), atol=1e-6)
    # with non-zero merge weights the pose must matter
    params2 = jax.tree_util.tree_map(lambda a: a, params)
    import flax

    flat = flax.traverse_util.flatten_dict(params2["params"])
    for k in flat:
        if "qkv_merge" in k and k[-1] == "kernel":
            flat[k] = jnp.ones_like(flat[k]) * 0.01
    params2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    out_pose2 = mod.apply(params2, x, pose)
    assert np.abs(np.asarray(out_pose2 - out_nopose)).max() > 1e-5


def test_pose_encoder_shapes():
    mod = CameraPoseEncoder(channels=(32, 64, 64, 64), cin=384)
    x = jnp.zeros((1, 2, 64, 64, 6), jnp.float32)
    params = mod.init(jax.random.key(4), x)
    feats = mod.apply(params, x)
    assert len(feats) == 4
    assert feats[0].shape == (1, 2, 8, 8, 32)
    assert feats[1].shape == (1, 2, 4, 4, 64)
    assert feats[3].shape == (1, 2, 1, 1, 64)


TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    attention_heads=4,
    cross_attention_dim=16,
    norm_num_groups=8,
)


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet3DConditionModel(TINY)
    B, F, H, W = 4, 2, 16, 16
    sample = jnp.zeros((B, F, H, W, 4), jnp.float32)
    t = jnp.asarray([500] * B)
    text = jnp.zeros((B, 7, 16), jnp.float32)
    pose = [
        jnp.zeros((B, F, H // (2**i), W // (2**i), TINY.block_out_channels[i]), jnp.float32)
        for i in range(4)
    ]
    cond = EpiConditioning(
        F_mats=jnp.zeros((B * F, 3, 3), jnp.float32), video_length=F, rand_slope_ff=False
    )
    params = model.init(jax.random.key(5), sample, t, text, pose, cond)
    return model, params, (sample, t, text, pose, cond)


@pytest.mark.slow
def test_unet_forward_shapes_and_aux(tiny_unet):
    model, params, (sample, t, text, pose, cond) = tiny_unet
    out, extras = model.apply(params, sample, t, text, pose, cond)
    assert out.shape == sample.shape
    # epi modules at every layer: down 2*3? -> resolutions (1,2,4,8) all on:
    # down: 2 layers x 4 blocks = 8, up: 3 layers x 4 blocks = 12, mid: 0
    assert len(extras["epi_qk"]) == 2 * (8 + 12)  # 2 epi attentions per module
    assert extras["auxiliary"] is None


@pytest.mark.slow
def test_unet_jit_compiles_and_is_deterministic(tiny_unet):
    model, params, (sample, t, text, pose, cond) = tiny_unet
    rng = np.random.default_rng(5)
    sample = jnp.asarray(rng.standard_normal(sample.shape), jnp.float32)

    @jax.jit
    def f(p, s):
        return model.apply(p, s, t, text, pose, cond)[0]

    o1 = f(params, sample)
    o2 = f(params, sample)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert np.isfinite(np.asarray(o1)).all()


def test_epi_missing_slope_rng_raises():
    """A caller that forgets rngs={'epi_slope': ...} on a conditioning that
    draws random slopes must fail loudly — not get deterministic
    pseudo-lines (round-3 advisor finding: the module path silently pinned
    slope 0 while the materialized-bias path raised)."""
    mod = EpiTransformer(in_channels=32, heads=4, norm_groups=8)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 2, 4, 4, 32)), jnp.float32
    )
    F_mats = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 3, 3)) * 1e-3, jnp.float32
    )
    cond = EpiConditioning(F_mats=F_mats, video_length=2, rand_slope_ff=True)
    params = mod.init(
        {"params": jax.random.key(0), "epi_slope": jax.random.key(1)}, x, cond
    )
    with pytest.raises(ValueError, match="epi_slope"):
        mod.apply(params, x, cond)  # no rngs -> loud failure
    # and the rng-provided path still works
    out, _ = mod.apply(params, x, cond, rngs={"epi_slope": jax.random.key(2)})
    assert out.shape == x.shape
