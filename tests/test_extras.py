"""SparseControlNet + DDIM inversion + misc utils."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cvd_tpu.models.sparse_controlnet import SparseControlNetModel
from cvd_tpu.models.unet import UNetConfig
from cvd_tpu.schedulers import DDIMScheduler
from cvd_tpu.schedulers.inversion import ddim_invert, ddim_inversion_step

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    attention_heads=4,
    cross_attention_dim=16,
    norm_num_groups=8,
    use_epi_module=False,
)


@pytest.mark.slow
def test_sparse_controlnet_residual_shapes_and_zero_init():
    model = SparseControlNetModel(TINY, use_motion_modules=True)
    B, F, h = 1, 2, 16
    sample = jnp.asarray(np.random.default_rng(0).standard_normal((B, F, h, h, 4)), jnp.float32)
    t = jnp.asarray([10])
    text = jnp.zeros((B, 7, 16))
    cond = jnp.zeros((B, F, 8 * h, 8 * h, 3))
    mask = jnp.zeros((B, F, 8 * h, 8 * h, 1))
    params = model.init(jax.random.key(0), sample, t, text, cond, mask)
    down, mid = model.apply(params, sample, t, text, cond, mask)
    assert len(down) == 12  # conv_in + 4 blocks x (2 layers) + 3 downsamples
    assert down[0].shape == (B, F, h, h, 32)
    assert mid.shape == (B, F, h // 8, h // 8, 64)
    # zero convs -> all residuals start at exactly zero (safe to add)
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0


def test_ddim_inversion_roundtrip():
    # inversion followed by sampling with the same eps model returns to x0
    sched = DDIMScheduler()
    st = sched.set_timesteps(25)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4)), jnp.float32)

    noisy, traj = ddim_invert(lambda lat, t: eps, sched, st, x0)
    assert traj.shape[0] == 25
    # denoise back down
    def body(x, t):
        return sched.step(st, eps, t, x), None

    back, _ = jax.lax.scan(body, noisy, st.timesteps)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=2e-3)


def test_video_export_fallback(tmp_path):
    from cvd_tpu.utils.video import save_video, save_video_as_images, save_videos_grid

    vid = np.random.default_rng(0).random((3, 16, 16, 3)).astype(np.float32)
    save_video(vid, str(tmp_path / "a.gif"))
    assert (tmp_path / "a.gif").exists()
    save_video(vid, str(tmp_path / "b.mp4"))  # may fall back to b.gif
    assert (tmp_path / "b.mp4").exists() or (tmp_path / "b.gif").exists()
    paths = save_video_as_images(vid, str(tmp_path / "frames"))
    assert len(paths) == 3
    save_videos_grid(vid[None].repeat(2, 0), str(tmp_path / "grid.gif"), n_rows=2)
    assert (tmp_path / "grid.gif").exists()


def test_check_fundamental_overlay():
    from cvd_tpu.utils.visualize import check_fundamental

    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0.0]])
    out = check_fundamental(img, img, F)
    assert out.shape == (32, 64, 3) and out.dtype == np.uint8


def test_visualize_correspondence_overlay():
    import numpy as np

    from cvd_tpu.utils.visualize import visualize_correspondence

    rng = np.random.default_rng(0)
    F_len, H, feat = 4, 32, 8
    videos = rng.random((2, F_len, H, H, 3)).astype(np.float32)
    N = feat * feat
    aux = {
        "query": rng.standard_normal((2 * F_len, N, 16)).astype(np.float32),
        "key": rng.standard_normal((2 * F_len, N, 16)).astype(np.float32),
    }
    F_mats = rng.standard_normal((F_len, 3, 3)).astype(np.float32) * 1e-3
    img = visualize_correspondence(videos, aux, F_mats)
    assert img.shape == (H, 2 * H, 3) and img.dtype == np.uint8


def test_eval_parity_cli(tmp_path):
    """PSNR/SSIM parity tool: identical dirs pass, noisy copies fail."""
    import imageio.v2 as imageio
    import numpy as np
    from cvd_tpu.cli.eval_parity import main as eval_main

    rng = np.random.default_rng(0)
    a = (rng.random((3, 16, 16, 3)) * 255).astype(np.uint8)
    noisy = np.clip(
        a.astype(np.int16) + rng.integers(-40, 40, a.shape), 0, 255
    ).astype(np.uint8)
    for name, vid in [("ref", a), ("same", a), ("noisy", noisy)]:
        d = tmp_path / name
        d.mkdir()
        for i, fr in enumerate(vid):
            imageio.imwrite(d / f"{i:04d}.png", fr)

    assert eval_main(["--ref", str(tmp_path / "ref"),
                      "--test", str(tmp_path / "same"), "--json"]) == 0
    assert eval_main(["--ref", str(tmp_path / "ref"),
                      "--test", str(tmp_path / "noisy"), "--json"]) == 1


def test_mono_direction_raises_like_reference():
    """The reference rejects mono_direction (attention_processor.py:622);
    the flag must fail loudly here too, not silently no-op."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from cvd_tpu.models.epi import EpiConditioning, EpiTransformer

    mod = EpiTransformer(in_channels=32, heads=4, num_transformer_blocks=1,
                         num_attention_blocks=1)
    x = jnp.zeros((2, 2, 4, 4, 32))
    cond = EpiConditioning(
        F_mats=jnp.zeros((4, 3, 3)), video_length=2, rand_slope_ff=False,
        mono_direction=True, use_flash_kernel=False,
    )
    with _pytest.raises(NotImplementedError):
        mod.init(jax.random.key(0), x, cond)


def test_non_square_resolution_rejected_upfront():
    """Non-square sizes fail with a clean message naming the epi
    constraint, not a mid-compile assert (VERDICT r1, Weak #6)."""
    import pytest as _pytest

    from cvd_tpu.cli.inference import build_parser, main

    args = build_parser().parse_args([
        "--random-weights", "--caption_file", "x.json",
        "--pose_file_0", "a", "--pose_file_1", "b",
        "--image_height", "256", "--image_width", "384",
        "--out_root", "/tmp/nowhere",
    ])
    with _pytest.raises(SystemExit, match="square"):
        main(args)

    from cvd_tpu.cli.inference_advanced import build_parser as bp2, main as main2

    args2 = bp2().parse_args([
        "--random-weights", "--caption_file", "x.txt",
        "--image_height", "256", "--image_width", "384",
        "--out_root", "/tmp/nowhere",
    ])
    with _pytest.raises(SystemExit, match="square"):
        main2(args2)
    args3 = bp2().parse_args([
        "--random-weights", "--caption_file", "x.txt", "--view_num", "3",
        "--out_root", "/tmp/nowhere",
    ])
    with _pytest.raises(SystemExit, match="even"):
        main2(args3)


def test_tokenizer_hard_fails_on_missing_folder(tmp_path):
    # A real-weights run must never silently fall back to the hash
    # tokenizer (the reference loads it unconditionally, inference_epi.py:77)
    import pytest

    from cvd_tpu.io.tokenizer import HashTokenizer, get_tokenizer

    assert isinstance(get_tokenizer(None), HashTokenizer)
    with pytest.raises(FileNotFoundError, match="tokenizer"):
        get_tokenizer(str(tmp_path))  # exists, but has no tokenizer/ subdir
