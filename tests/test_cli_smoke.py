"""End-to-end CLI smoke tests (tiny random-weight models, CPU mesh).

These drive the public entry points exactly as a user would — argument
parsing, pipeline assembly, sampling, artifact writing — mirroring the
reference's `run_inference_simple.sh` / `run_inference_advanced.sh`.
"""
import json
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow

def _write_pose_file(path, n=30, reverse=False):
    """Minimal RealEstate10K-format pose file (reference
    assets/pose_files/*.txt: URL header, then per-frame
    `ts fx fy cx cy 0 0 w2c(3x4 row-major)`)."""
    rng = np.random.default_rng(0 if not reverse else 1)
    with open(path, "w") as f:
        f.write("https://example.com/video\n")
        for i in range(n):
            t = i * (0.04 if not reverse else -0.03)
            w2c = np.eye(4)[:3]
            w2c = w2c.copy()
            w2c[0, 3] = t
            w2c[1, 3] = 0.01 * i
            vals = [i * 1000, 0.6, 0.8, 0.5, 0.5, 0.0, 0.0] + list(w2c.reshape(-1))
            f.write(" ".join(str(v) for v in vals) + "\n")


def test_inference_cli_smoke(tmp_path):
    from cvd_tpu.cli.inference import build_parser, main

    cap = tmp_path / "prompts.json"
    cap.write_text(json.dumps({"captions": ["a tiny test scene"]}))
    p0, p1 = tmp_path / "p0.txt", tmp_path / "p1.txt"
    _write_pose_file(p0)
    _write_pose_file(p1, reverse=True)
    out = tmp_path / "out"
    args = build_parser().parse_args([
        "--random-weights", "--caption_file", str(cap),
        "--pose_file_0", str(p0), "--pose_file_1", str(p1),
        "--image_height", "64", "--image_width", "64",
        "--video_length", "2", "--num_inference_steps", "2",
        "--bf16",  # exercises the cast_params bf16-weight deployment path
        "--out_root", str(out),
    ])
    main(args)
    vids = out / "0" / "vids"
    # save_video falls back to gif when no ffmpeg backend is present
    assert (vids / "horizontal.mp4").exists() or (vids / "horizontal.gif").exists()
    assert (out / "0" / "imgs" / "0" / "0000.png").exists()
    assert (out / "0" / "imgs" / "1" / "0001.png").exists()


def test_inference_advanced_cli_smoke(tmp_path):
    from cvd_tpu.cli.inference_advanced import build_parser, main

    cap = tmp_path / "prompts.json"
    cap.write_text(json.dumps({
        "captions": ["a tiny advanced scene"],
        "negative_prompts": ["blurry, watermark"],
    }))
    out = tmp_path / "out"
    args = build_parser().parse_args([
        "--random-weights", "--caption_file", str(cap),
        "--use_negative_prompt",  # per-prompt negative, reference :444
        "--image_height", "64", "--image_width", "64",
        "--video_length", "2", "--num_inference_steps", "2",
        "--view_num", "2", "--multistep", "2", "--cam_pattern", "circle",
        "--out_root", str(out),
    ])
    main(args)
    sub = out / "0_0000"
    assert (sub / "video.mp4").exists() or (sub / "video.gif").exists()
    assert (sub / "transforms.json").exists()
    meta = json.loads((sub / "transforms.json").read_text())
    assert len(meta["frames"]) == 2 * 2  # V * F


def _write_webvid_root(root, n_clips=4, n_frames=4, size=72):
    """Synthetic WebVid-style root: videos/<clip>/<i>.png + captions.json."""
    from PIL import Image

    rng = np.random.default_rng(1)
    captions = {}
    for c in range(n_clips):
        clip = f"web{c}"
        d = root / "videos" / clip
        os.makedirs(d)
        for i in range(n_frames):
            arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:04d}.png")
        captions[clip] = f"webvid caption {c}"
    (root / "captions.json").write_text(json.dumps(captions))


def _train_cfg(out_dir, train_data, steps=2):
    return {
        "output_dir": str(out_dir),
        "random_weights": True,
        "sample_size": 64,
        "sample_n_frames": 2,
        "train_data": train_data,
        "train_batch_size": 4,
        "num_workers": 0,
        "learning_rate": 1e-4,
        "max_train_steps": steps,
        "checkpointing_steps": steps,
        "logger_interval": 1,
        "global_seed": 7,
    }


def test_train_cli_webvid_smoke(tmp_path):
    """Unposed (WebVid) training end-to-end: homography pseudo-pairs,
    H_mats + warped_masks reach the jitted step, image LoRA off
    (train_epi_control.py:79-84, 532-545, 580-581)."""
    import yaml

    from cvd_tpu.cli.train import build_parser, main

    root = tmp_path / "webvid"
    _write_webvid_root(root)
    out_dir = tmp_path / "run"
    cfg = _train_cfg(out_dir, {"dataset_name": "webvid10m",
                               "root_path": str(root)})
    # exercise the forked-decode-worker path through the real trainer
    cfg["num_workers"] = 2
    cfg["worker_type"] = "process"
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    main(build_parser().parse_args(["--config", str(cfg_path)]))

    assert (out_dir / "checkpoints" / "checkpoint-step-2.ckpt").exists()
    # sanity dumps from the TRAINING batch (train_epi_control.py:503-510)
    sanity = out_dir / "sanity_check"
    assert any(p.suffix == ".gif" for p in sanity.iterdir())
    assert (sanity / "epi_overlay.png").exists()
    metrics = [json.loads(l) for l in
               (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_train_cli_hybrid_smoke(tmp_path):
    """Hybrid posed+unposed training: kind-homogeneous batches alternate
    between the RealEstate10K and WebVid sources (train_epi_control.py:85-89)."""
    import yaml
    from PIL import Image

    from cvd_tpu.cli.train import build_parser, main

    re_root = tmp_path / "re10k"
    os.makedirs(re_root / "RealEstate10K" / "train")
    os.makedirs(re_root / "annotation_json")
    captions = {}
    rng = np.random.default_rng(0)
    for c in range(4):
        clip = f"clip{c}"
        _write_pose_file(re_root / "RealEstate10K" / "train" / f"{clip}.txt", n=9)
        frame_dir = re_root / "dataset" / "train" / clip
        os.makedirs(frame_dir)
        for i in range(9):
            arr = (rng.random((72, 72, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(frame_dir / f"{i * 1000}.png")
        captions[clip + ".mp4"] = [f"caption for {clip}"]
    json.dump(captions,
              open(re_root / "annotation_json" / "train_captions.json", "w"))
    wv_root = tmp_path / "webvid"
    _write_webvid_root(wv_root)

    out_dir = tmp_path / "run"
    cfg = _train_cfg(out_dir, {
        "dataset_name": "hybrid",
        "posed_ratio": 0.5,
        "realestate10k": {"root_path": str(re_root), "sample_stride": 1},
        "webvid10m": {"root_path": str(wv_root)},
    }, steps=4)
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    main(build_parser().parse_args(["--config", str(cfg_path)]))

    assert (out_dir / "checkpoints" / "checkpoint-step-4.ckpt").exists()
    metrics = [json.loads(l) for l in
               (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 4
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_train_cli_smoke(tmp_path):
    """Drives cli.train end-to-end: synthetic RealEstate10K root -> folded
    batches -> jitted mesh train step -> orbax + reference-format ckpts."""
    import yaml
    from PIL import Image

    from cvd_tpu.cli.train import build_parser, main

    root = tmp_path / "re10k"
    os.makedirs(root / "RealEstate10K" / "train")
    os.makedirs(root / "annotation_json")
    captions = {}
    rng = np.random.default_rng(0)
    for c in range(4):
        clip = f"clip{c}"
        _write_pose_file(root / "RealEstate10K" / "train" / f"{clip}.txt", n=9)
        frame_dir = root / "dataset" / "train" / clip
        os.makedirs(frame_dir)
        for i in range(9):
            arr = (rng.random((72, 72, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(frame_dir / f"{i * 1000}.png")
        captions[clip + ".mp4"] = [f"caption for {clip}"]
    json.dump(captions, open(root / "annotation_json" / "train_captions.json", "w"))

    out_dir = tmp_path / "run"
    cfg = {
        "output_dir": str(out_dir),
        "random_weights": True,
        "sample_size": 64,
        "sample_n_frames": 2,
        "train_data": {"root_path": str(root), "sample_stride": 1},
        "train_batch_size": 4,   # 8 folded rows over the 8-device mesh
        "num_workers": 0,
        "learning_rate": 1e-4,
        "max_train_steps": 2,
        "checkpointing_steps": 2,
        "logger_interval": 1,
        "global_seed": 7,
    }
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    args = build_parser().parse_args(["--config", str(cfg_path)])
    main(args)

    ckpts = out_dir / "checkpoints"
    assert (ckpts / "step-2").exists()               # orbax
    assert (ckpts / "checkpoint-step-2.ckpt").exists()  # reference format
    assert (out_dir / "metrics.jsonl").exists() or any(
        p.name.endswith(".jsonl") for p in out_dir.iterdir()
    )


def test_load_prompts_negative_length_mismatch(tmp_path):
    """--use_negative_prompt fails at LOAD time when negative_prompts is
    shorter than captions (not mid-run after minutes of sampling)."""
    from cvd_tpu.cli.inference import load_prompts

    cap = tmp_path / "p.json"
    cap.write_text(json.dumps({
        "captions": ["a", "b", "c"], "negative_prompts": ["blurry"],
    }))
    with pytest.raises(SystemExit, match="negative_prompts has 1"):
        load_prompts(str(cap), True)
    # without the flag the mismatch is irrelevant
    caps, negs, _ = load_prompts(str(cap), False)
    assert len(caps) == 3 and negs is None
