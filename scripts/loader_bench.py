"""Loader decode-throughput bench at training shapes.

Builds a synthetic RealEstate10K mp4 root (480x270 clips, 40 frames — the
decode cost driver is the 2N-1=31 ordinal frame reads + resize/crop to
256px per item), then times DataLoader with thread vs process workers at
the train config (batch = 2 videos/step) and compares against the measured
train-step budget (BASELINE.md: 576 ms/step), i.e. the loader must sustain
>= 2 items / 576 ms with ~2x headroom to never stall the chip.

Usage: python scripts/loader_bench.py [--items 16] [--workers N]
Prints one JSON line: items/s per worker type + headroom vs the budget.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP_BUDGET_S = 0.576  # BASELINE.md train iteration, B=2 folded pairs
ITEMS_PER_STEP = 2     # 2 videos/step (each item is a folded pair)


def build_root(root: str, n_clips: int = 4, n_frames: int = 40,
               w: int = 480, h: int = 270) -> None:
    import cv2

    os.makedirs(os.path.join(root, "RealEstate10K", "train"))
    os.makedirs(os.path.join(root, "dataset", "train"))
    os.makedirs(os.path.join(root, "annotation_json"))
    captions = {}
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for c in range(n_clips):
        clip = f"clip{c}"
        lines = ["https://example.com/video\n"]
        for i in range(n_frames):
            w2c = np.eye(4)
            w2c[:3, 3] = [0.01 * i, 0.0, 0.02 * i]
            vals = ([str(100 + i), "0.5", "0.89", "0.5", "0.5", "0", "0"]
                    + [f"{x:.6f}" for x in w2c[:3].reshape(-1)])
            lines.append(" ".join(vals) + "\n")
        with open(os.path.join(root, "RealEstate10K", "train",
                               f"{clip}.txt"), "w") as f:
            f.writelines(lines)
        vw = cv2.VideoWriter(
            os.path.join(root, "dataset", "train", f"{clip}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h),
        )
        assert vw.isOpened(), "cv2 mp4 writer unavailable"
        for i in range(n_frames):
            r = xs / w * 255
            g = ys / h * 255
            b = np.full_like(r, (i * 9 + c * 17) % 255)
            vw.write(np.stack([b, g, r], -1).astype(np.uint8))
        vw.release()
        captions[f"{clip}.mp4"] = [f"synthetic clip {c}"]
    json.dump(captions, open(
        os.path.join(root, "annotation_json", "train_captions.json"), "w"))


def time_loader(ds, worker_type: str, workers: int, items: int) -> float:
    from cvd_tpu.data.loader import DataLoader

    dl = DataLoader(ds, batch_size=ITEMS_PER_STEP, shuffle=True, seed=0,
                    num_workers=workers, prefetch=4, worker_type=worker_type)
    done, t0 = 0, None
    while done < items:
        for batch in dl:
            if t0 is None:
                t0 = time.time()  # skip pool spin-up for the steady rate
                continue
            done += batch["pixel_values"].shape[0]
            if done >= items:
                break
    return done / (time.time() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=16)
    p.add_argument("--workers", type=int, default=min(8, os.cpu_count() or 1))
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    from cvd_tpu.data.realestate10k import RealEstate10KPoseFolded

    with tempfile.TemporaryDirectory() as root:
        build_root(root)
        ds = RealEstate10KPoseFolded(
            root_path=root, sample_stride=1, sample_n_frames=args.frames,
            sample_size=args.size, seed=0,
        )
        result = {"metric": "loader_items_per_s", "unit": "items/s",
                  "workers": args.workers, "cores": os.cpu_count(),
                  "budget_items_per_s": round(ITEMS_PER_STEP / STEP_BUDGET_S, 2)}
        for wt in ("thread", "process"):
            rate = time_loader(ds, wt, args.workers, args.items)
            result[f"{wt}_items_per_s"] = round(rate, 2)
            result[f"{wt}_headroom"] = round(
                rate / (ITEMS_PER_STEP / STEP_BUDGET_S), 2)
        result["value"] = result["process_items_per_s"]
        print(json.dumps(result))


if __name__ == "__main__":
    main()
