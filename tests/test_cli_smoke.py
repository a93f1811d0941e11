"""End-to-end CLI smoke tests (tiny random-weight models, CPU mesh).

These drive the public entry points exactly as a user would — argument
parsing, pipeline assembly, sampling, artifact writing — mirroring the
reference's `run_inference_simple.sh` / `run_inference_advanced.sh`.
"""
import json
import os

import numpy as np
import pytest


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

    cap = tmp_path / "prompts.txt"
    cap.write_text("a tiny advanced scene\n")
    out = tmp_path / "out"
    args = build_parser().parse_args([
        "--random-weights", "--caption_file", str(cap),
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
