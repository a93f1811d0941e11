"""Dataset + loader tests over synthetic RealEstate10K-format fixtures."""
import json
import os

import numpy as np
import pytest

from cvd_tpu.data.loader import DataLoader, shard_indices
from cvd_tpu.data.realestate10k import RealEstate10KPoseFolded
from cvd_tpu.data.validation import ValRealEstate10KPoseFolded


def write_pose_file(path, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    lines = ["https://example.com/video\n"]
    for i in range(n_frames):
        # slowly translating camera, w2c 3x4 row-major
        w2c = np.eye(4)
        w2c[:3, 3] = [0.01 * i, 0.0, 0.02 * i]
        vals = [str(100 + i), "0.5", "0.89", "0.5", "0.5", "0", "0"] + [
            f"{x:.6f}" for x in w2c[:3].reshape(-1)
        ]
        lines.append(" ".join(vals) + "\n")
    with open(path, "w") as f:
        f.writelines(lines)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("re10k")
    os.makedirs(root / "RealEstate10K" / "train")
    os.makedirs(root / "annotation_json")
    captions = {}
    from PIL import Image

    for c, clip in enumerate(["clipA", "clipB"]):
        write_pose_file(root / "RealEstate10K" / "train" / f"{clip}.txt", 9, seed=c)
        frame_dir = root / "dataset" / "train" / clip
        os.makedirs(frame_dir)
        rng = np.random.default_rng(c)
        for i in range(9):
            img = (rng.random((36, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(frame_dir / f"{100+i}.png")
        captions[f"{clip}.mp4"] = [f"a tour of {clip}"]
    json.dump(captions, open(root / "annotation_json" / "train_captions.json", "w"))
    return str(root)


def test_train_dataset_folded_sample(fake_root):
    ds = RealEstate10KPoseFolded(
        fake_root, sample_n_frames=4, sample_size=32, seed=0, return_clip_name=True
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["pixel_values"].shape == (8, 32, 32, 3)
    assert s["plucker_embedding"].shape == (8, 32, 32, 6)
    assert s["F_mats"].shape == (8, 3, 3)
    assert -1.0 <= s["pixel_values"].min() and s["pixel_values"].max() <= 1.0
    # shared start frame: first frames of both folded videos are identical
    np.testing.assert_array_equal(s["pixel_values"][0], s["pixel_values"][4])
    np.testing.assert_array_equal(s["ret_c2w"][0], s["ret_c2w"][4])
    # relative pose normalization: the shared start is the identity
    np.testing.assert_allclose(s["ret_c2w"][0], np.eye(4), atol=1e-6)
    # reverse-direction F mats are transposes
    np.testing.assert_allclose(s["F_mats"][5], s["F_mats"][1].T, atol=1e-6)


def test_validation_dataset(fake_root, tmp_path):
    p0, p1 = tmp_path / "p0.txt", tmp_path / "p1.txt"
    write_pose_file(p0, 6, seed=3)
    write_pose_file(p1, 6, seed=4)
    ds = ValRealEstate10KPoseFolded(
        validation_prompts=["a castle", "a beach"],
        validation_negative_prompts=["blurry", "dark"],
        pose_file_0=str(p0),
        pose_file_1=str(p1),
        sample_n_frames=4,
        sample_size=32,
    )
    assert len(ds) == 2
    s = ds[1]
    assert s["validation_prompt"] == "a beach"
    assert s["validation_negative_prompt"] == "dark"
    assert s["plucker_embedding"].shape == (8, 32, 32, 6)
    assert s["F_mats"].shape == (8, 3, 3)
    np.testing.assert_allclose(s["ret_c2w"][0], np.eye(4), atol=1e-5)


def test_dataset_retry_on_missing_frames(fake_root):
    ds = RealEstate10KPoseFolded(fake_root, sample_n_frames=4, sample_size=32, seed=1)
    # break clipA's frames; retries should fall back to clipB
    import shutil

    broken = os.path.join(fake_root, "dataset", "train", "clipA_backup")
    orig = os.path.join(fake_root, "dataset", "train", "clipA")
    shutil.move(orig, broken)
    try:
        s = ds[0]
        assert s["pixel_values"].shape == (8, 32, 32, 3)
    finally:
        shutil.move(broken, orig)


def test_loader_batching_and_sharding(fake_root):
    ds = RealEstate10KPoseFolded(fake_root, sample_n_frames=4, sample_size=32, seed=2)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batch = next(iter(dl))
    assert batch["pixel_values"].shape == (2, 8, 32, 32, 3)
    assert isinstance(batch["text"], list) and len(batch["text"]) == 2

    # per-process shards partition the permutation
    i0 = shard_indices(10, epoch=0, process_index=0, process_count=2)
    i1 = shard_indices(10, epoch=0, process_index=1, process_count=2)
    assert sorted(list(i0) + list(i1)) == list(range(10))
    # deterministic per epoch
    np.testing.assert_array_equal(i0, shard_indices(10, 0, 0, 0, 2))


def _smooth_frames(n, h=36, w=64):
    """Codec-friendly smooth gradients (lossy mp4 stays close to source)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    out = []
    for i in range(n):
        r = (xs / w * 255)
        g = (ys / h * 255)
        b = np.full_like(r, i * 20.0)
        out.append(np.stack([r, g, b], -1).astype(np.uint8))
    return out


@pytest.fixture(scope="module")
def mp4_root(tmp_path_factory):
    """Root with mp4 clips instead of extracted pngs."""
    import cv2

    root = tmp_path_factory.mktemp("re10k_mp4")
    os.makedirs(root / "RealEstate10K" / "train")
    os.makedirs(root / "dataset" / "train")
    os.makedirs(root / "annotation_json")
    captions = {}
    for c, clip in enumerate(["vidA", "vidB"]):
        write_pose_file(root / "RealEstate10K" / "train" / f"{clip}.txt", 9, seed=c)
        vw = cv2.VideoWriter(
            str(root / "dataset" / "train" / f"{clip}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 36),
        )
        assert vw.isOpened(), "cv2 mp4 writer unavailable"
        for f in _smooth_frames(9):
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
        captions[f"{clip}.mp4"] = [f"a tour of {clip}"]
    json.dump(captions, open(root / "annotation_json" / "train_captions.json", "w"))
    return str(root)


def test_mp4_ingestion_and_extraction(mp4_root):
    """The dataset reads mp4 clips directly (reference decord parity,
    dataset_train_realestate10k.py:386-460); extract_frames produces the
    png layout and both paths agree up to codec noise."""
    from cvd_tpu.data.extract_frames import main as extract_main
    import sys
    from unittest import mock

    ds_mp4 = RealEstate10KPoseFolded(
        root_path=mp4_root, sample_stride=1, sample_n_frames=2,
        sample_size=32, seed=0,
    )
    assert len(ds_mp4) == 2
    item_mp4 = ds_mp4[0]
    assert item_mp4["pixel_values"].shape == (4, 32, 32, 3)
    assert np.isfinite(item_mp4["pixel_values"]).all()

    with mock.patch.object(sys, "argv",
                           ["extract_frames", "--root", mp4_root]):
        extract_main()
    # pngs now exist named by pose cids; the png path takes precedence
    assert os.path.exists(
        os.path.join(mp4_root, "dataset", "train", "vidA", "100.png")
    )
    ds_png = RealEstate10KPoseFolded(
        root_path=mp4_root, sample_stride=1, sample_n_frames=2,
        sample_size=32, seed=0,
    )
    item_png = ds_png[0]
    # identical frame selection (same seed) -> same pixels up to codec noise
    assert (
        np.abs(item_png["pixel_values"] - item_mp4["pixel_values"]).mean()
        < 0.08
    )
    np.testing.assert_allclose(item_png["F_mats"], item_mp4["F_mats"],
                               atol=1e-6)


def test_remote_datasets_stream_via_file_urls(mp4_root, tmp_path):
    """Remote variants (train_epi_control.py:79-89 contract): per-clip
    artifacts stream from a base URL into a local cache, then the local
    dataset logic serves items."""
    from cvd_tpu.data.remote import RealEstate10KPoseFoldedRemote, WebVid10MRemote

    # index file the remote reader needs
    with open(os.path.join(mp4_root, "RealEstate10K", "train", "index.txt"),
              "w") as f:
        f.write("vidA\nvidB\n")
    base = "file://" + mp4_root
    ds = RealEstate10KPoseFoldedRemote(
        base_url=base, cache_dir=str(tmp_path / "cache"),
        sample_stride=1, sample_n_frames=2, sample_size=32, seed=0,
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["pixel_values"].shape == (4, 32, 32, 3)
    assert item["F_mats"].shape == (4, 3, 3)
    # second access reuses the cache (no re-download path issues)
    item2 = ds[1]
    assert np.isfinite(item2["pixel_values"]).all()

    # webvid remote over a synthetic root
    wroot = tmp_path / "webvid_src"
    from PIL import Image

    os.makedirs(wroot / "videos" / "w0")
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)
                        ).save(wroot / "videos" / "w0" / f"{i:04d}.png")
    (wroot / "captions.json").write_text(json.dumps({"w0": "a caption"}))
    (wroot / "index.txt").write_text("w0 4\n")
    wds = WebVid10MRemote(
        base_url="file://" + str(wroot), cache_dir=str(tmp_path / "wcache"),
        sample_n_frames=2, sample_size=32, seed=0,
    )
    witem = wds[0]
    assert witem["pixel_values"].shape == (4, 32, 32, 3)
    assert witem["H_mats"].shape == (4, 3, 3)
    assert witem["warped_masks"].shape == (4, 4, 4, 1)


def test_remote_fetch_retries_resumes_and_auths(tmp_path, monkeypatch):
    """Transport hardening of data.remote._fetch: one transient failure
    then success (bounded backoff), partial-download resume via Range,
    auth headers from the environment, and no retry on a hard 404."""
    import io
    import urllib.error
    import urllib.request
    from unittest import mock

    from cvd_tpu.data import remote as R

    monkeypatch.setattr(R, "BACKOFF_SECONDS", 0.01)
    payload = b"0123456789abcdef"
    seen = []

    class FakeResponse(io.BytesIO):
        def __init__(self, data, status=200):
            super().__init__(data)
            self.status = status

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    # 1) transient URLError once, then success
    calls = {"n": 0}

    def flaky(req, *a, **kw):
        seen.append(dict(req.header_items()))
        calls["n"] += 1
        if calls["n"] == 1:
            raise urllib.error.URLError("connection reset")
        return FakeResponse(payload)

    dest = tmp_path / "a.bin"
    monkeypatch.setenv("CVD_TPU_REMOTE_TOKEN", "sekrit")
    with mock.patch.object(urllib.request, "urlopen", flaky):
        out = R._fetch("https://example.com/a.bin", str(dest))
    assert open(out, "rb").read() == payload
    assert calls["n"] == 2
    # auth header rode along on every attempt
    assert all(h.get("Authorization") == "Bearer sekrit" for h in seen)

    # 2) partial .tmp resumes with a Range header and appends
    dest2 = tmp_path / "b.bin"
    (tmp_path / "b.bin.tmp").write_bytes(payload[:6])
    seen.clear()

    def ranged(req, *a, **kw):
        seen.append(dict(req.header_items()))
        assert req.headers.get("Range") == "bytes=6-"
        return FakeResponse(payload[6:], status=206)

    with mock.patch.object(urllib.request, "urlopen", ranged):
        out2 = R._fetch("https://example.com/b.bin", str(dest2))
    assert open(out2, "rb").read() == payload

    # 3) hard 404 raises immediately, no retries
    calls404 = {"n": 0}

    def missing(req, *a, **kw):
        calls404["n"] += 1
        raise urllib.error.HTTPError(req.full_url, 404, "nope", {}, None)

    with mock.patch.object(urllib.request, "urlopen", missing):
        with pytest.raises(urllib.error.HTTPError):
            R._fetch("https://example.com/missing.bin", str(tmp_path / "c"))
    assert calls404["n"] == 1


def test_remote_dataset_indexes_incrementally(mp4_root, tmp_path):
    """New clips append to ONE local dataset index (advisor r2: no O(N^2)
    rebuild, no rng reseed when a clip arrives mid-epoch)."""
    from cvd_tpu.data.remote import RealEstate10KPoseFoldedRemote

    with open(os.path.join(mp4_root, "RealEstate10K", "train", "index.txt"),
              "w") as f:
        f.write("vidA\nvidB\n")
    ds = RealEstate10KPoseFoldedRemote(
        base_url="file://" + mp4_root, cache_dir=str(tmp_path / "cache"),
        sample_stride=1, sample_n_frames=2, sample_size=32, seed=0,
    )
    local = ds._local
    rng = local.rng
    _ = ds[0]
    _ = ds[1]
    # same local dataset object and rng throughout; index grew in place
    assert ds._local is local and local.rng is rng
    assert [e["clip_name"] for e in local.dataset] == ["vidA", "vidB"]
    # cached second pass hits the same entries without re-indexing
    n_before = len(local.dataset)
    _ = ds[0]
    assert len(local.dataset) == n_before


def test_loader_process_workers(fake_root):
    """worker_type='process' (the reference's num_workers=32 decode-process
    equivalent): forked workers serve identical content to thread workers,
    and producer exceptions propagate instead of hanging the consumer."""
    ds = RealEstate10KPoseFolded(fake_root, sample_n_frames=4, sample_size=32,
                                 seed=2)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=7, num_workers=2,
                    worker_type="process")
    batch = next(iter(dl))
    assert batch["pixel_values"].shape == (2, 8, 32, 32, 3)
    assert np.isfinite(batch["pixel_values"]).all()
    assert isinstance(batch["text"], list) and len(batch["text"]) == 2

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        next(iter(DataLoader(Broken(), batch_size=2, num_workers=2,
                             worker_type="process")))


class _TaggedDS:
    """Picklable fork-inherited dataset whose items carry its identity."""

    def __init__(self, tag, n=8):
        self.tag, self.n = tag, n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"tag": np.full((2,), self.tag, np.int32),
                "idx": np.asarray([i], np.int32)}


def test_concurrent_process_loaders_serve_own_dataset():
    """Two process-worker loaders iterated concurrently (hybrid training's
    shape) must each serve THEIR dataset: the fork-staging global is
    serialized, so loader A's pool can't capture loader B's dataset."""
    dla = DataLoader(_TaggedDS(1), batch_size=2, shuffle=False, num_workers=2,
                     worker_type="process")
    dlb = DataLoader(_TaggedDS(2), batch_size=2, shuffle=False, num_workers=2,
                     worker_type="process")
    ita, itb = iter(dla), iter(dlb)  # both pools forked before either drains
    for _ in range(3):
        a, b = next(ita), next(itb)
        assert (a["tag"] == 1).all(), a["tag"]
        assert (b["tag"] == 2).all(), b["tag"]
    ita.close()
    itb.close()


def test_process_loader_early_exit_cleans_up():
    """Abandoning iteration mid-epoch must not hang: the producer's bounded
    q.put re-checks stop, and the forked pool is terminated in finally."""
    import multiprocessing

    dl = DataLoader(_TaggedDS(3, n=64), batch_size=2, shuffle=False,
                    num_workers=2, prefetch=1, worker_type="process")
    for _ in range(3):
        it = iter(dl)
        next(it)
        it.close()  # runs the generator's finally: stop + pool.terminate
    # no forked worker survives the closed iterations
    assert multiprocessing.active_children() == []


def test_latents_cache_roundtrip(fake_root, tmp_path):
    """build_latents_cache encodes each item once; CachedLatentsDataset
    round-trips the posterior moments and re-derives an identical Plücker
    embedding from the cached poses (no 50 MB plucker on disk)."""
    import jax.numpy as jnp

    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from tiny import tiny_modules

    from cvd_tpu.data.latents_cache import (
        CachedLatentsDataset, build_latents_cache,
    )

    ds = RealEstate10KPoseFolded(fake_root, sample_n_frames=4, sample_size=32,
                                 seed=0)
    modules = tiny_modules(8, 2)  # only the VAE is used (conv: any size)
    cdir = str(tmp_path / "latcache")
    # pin the random frame sampling: cache build and comparison must see
    # the same item -> re-seed the dataset rng before each pass
    ds.rng.seed(123)
    build_latents_cache(ds, modules, cdir, num_items=2)
    cached = CachedLatentsDataset(cdir)
    assert len(cached) == 2

    ds.rng.seed(123)
    raw = ds[0]
    item = cached[0]
    assert item["latent_mean"].shape == (8, 4, 4, 4)
    assert item["latent_logvar"].shape == (8, 4, 4, 4)
    # moments match a direct encode at f16 storage tolerance
    mean, logvar = modules.vae.apply(
        modules.vae_params, jnp.asarray(raw["pixel_values"], jnp.float32),
        method=modules.vae.encode,
    )
    np.testing.assert_allclose(item["latent_mean"], np.asarray(mean),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(item["latent_logvar"], np.asarray(logvar),
                               rtol=0, atol=2e-3)
    # plucker re-derivation is exact vs the source dataset's
    np.testing.assert_allclose(item["plucker_embedding"],
                               raw["plucker_embedding"], atol=1e-5)
    np.testing.assert_array_equal(item["F_mats"], raw["F_mats"])
    assert item["text"] == raw["text"]

    # the loader + train fold path consumes the cached keys
    loader = DataLoader(cached, batch_size=1, num_workers=0, seed=0)
    batch = next(iter(loader))
    assert batch["latent_mean"].shape == (1, 8, 4, 4, 4)
