"""Extended spatial attention, runtime LoRA scale, WebVid/hybrid datasets."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu.models.layers import Transformer2DModel


def test_extended_attention_couples_views():
    mod = Transformer2DModel(32, 4, 8, cross_attention_dim=16, groups=8,
                             extended_attention=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((4, 5, 16)), jnp.float32)
    params = mod.init(jax.random.key(0), x, ctx)
    out1 = mod.apply(params, x, ctx)
    # change only the second half (the partner view rows)
    x2 = x.at[2:].add(jnp.asarray(rng.standard_normal(x[2:].shape), jnp.float32))
    out2 = mod.apply(params, x2, ctx)
    assert np.abs(np.asarray(out2[:2] - out1[:2])).max() > 1e-5

    # without extension, first-half rows are independent of second-half rows
    mod0 = Transformer2DModel(32, 4, 8, cross_attention_dim=16, groups=8)
    params0 = mod0.init(jax.random.key(0), x, ctx)
    a = mod0.apply(params0, x, ctx)
    b = mod0.apply(params0, x2, ctx)
    np.testing.assert_allclose(np.asarray(a[:2]), np.asarray(b[:2]), atol=1e-6)


def test_runtime_lora_scale():
    mod = Transformer2DModel(32, 4, 8, cross_attention_dim=16, groups=8, lora_rank=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    params = mod.init(jax.random.key(1), x, ctx)
    # LoRA up is zero-init -> scale has no effect until weights load
    o0 = mod.apply(params, x, ctx, lora_scale=0.0)
    o1 = mod.apply(params, x, ctx, lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-6)
    # set non-zero lora weights: scale now matters and 0.0 restores base
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in list(flat):
        if "lora" in "/".join(k) and k[-1] == "kernel" and "up" in "/".join(k):
            flat[k] = jnp.ones_like(flat[k]) * 0.01
    params2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    o2_on = mod.apply(params2, x, ctx, lora_scale=1.0)
    o2_off = mod.apply(params2, x, ctx, lora_scale=0.0)
    np.testing.assert_allclose(np.asarray(o2_off), np.asarray(o0), atol=1e-6)
    assert np.abs(np.asarray(o2_on - o2_off)).max() > 1e-5


@pytest.fixture(scope="module")
def webvid_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("webvid")
    caps = {}
    rng = np.random.default_rng(0)
    for clip in ["vidA", "vidB"]:
        d = root / "videos" / clip
        os.makedirs(d)
        for i in range(6):
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
                d / f"{i:03d}.png"
            )
        caps[clip] = f"clip {clip}"
    json.dump(caps, open(root / "captions.json", "w"))
    return str(root)


def test_webvid_folded(webvid_root):
    from cvd_tpu.data.webvid import WebVidFolded

    ds = WebVidFolded(webvid_root, sample_n_frames=4, sample_size=32, seed=0)
    assert len(ds) == 2
    s = ds[0]
    assert s["pixel_values"].shape == (8, 32, 32, 3)
    assert s["H_mats"].shape == (8, 3, 3)
    assert s["warped_masks"].shape == (8, 4, 4, 1)
    # first-video masks are all ones; warped masks partially valid
    assert s["warped_masks"][:4].min() == 1.0
    assert 0.0 <= s["warped_masks"][4:].mean() <= 1.0
    # H pair consistency: H_mats second half is the inverse
    np.testing.assert_allclose(
        s["H_mats"][0] @ s["H_mats"][4], np.eye(3), atol=1e-5
    )


def test_hybrid_mixes(webvid_root):
    from cvd_tpu.data.webvid import HybridDataset, WebVidFolded

    ds = WebVidFolded(webvid_root, sample_n_frames=4, sample_size=32, seed=0)

    class Stub:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"F_mats": np.zeros((8, 3, 3))}

    hy = HybridDataset(Stub(), ds, ratio_a=0.5, seed=0, length=20)
    kinds = set()
    for i in range(20):
        kinds.add("posed" if "F_mats" in hy[i] else "unposed")
    assert kinds == {"posed", "unposed"}


def test_warp_homography_identity():
    from cvd_tpu.data.webvid import warp_homography

    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    out, mask = warp_homography(img, np.eye(3))
    np.testing.assert_allclose(out, img, atol=1e-6)
    assert mask.min() == 1.0
