"""Pose-free (WebVid-style) training data + the hybrid mixer.

The reference imports ``dataset_webvid10m_remote`` / ``dataset_hybrid_remote``
which are absent from the release; only their call-site contract survives
(train_epi_control.py:79-89, 532-545): pose-free batches carry
``H_mats [2F, 3, 3]`` (pseudo-epipolar homographies) and
``warped_masks [2F, H, W]`` that mask the MSE to valid warped pixels, and
disable the image LoRA. Re-derivation: the second "view" of an unposed clip
is a random-homography warp of the first; H relates the two pixel grids so
the epi module gets homography-consistent pseudo-epipolar lines, and the
mask marks pixels that stayed inside the frame.
"""
from __future__ import annotations

import glob
import json
import os
import random
from typing import List, Optional, Sequence

import numpy as np


def random_homography(
    rng: random.Random, size: int, max_rot: float = 0.05,
    max_trans: float = 0.08, max_persp: float = 2e-4,
) -> np.ndarray:
    """Small random homography in centred pixel coordinates."""
    ang = rng.uniform(-max_rot, max_rot)
    tx = rng.uniform(-max_trans, max_trans) * size
    ty = rng.uniform(-max_trans, max_trans) * size
    p1 = rng.uniform(-max_persp, max_persp)
    p2 = rng.uniform(-max_persp, max_persp)
    c, s = np.cos(ang), np.sin(ang)
    return np.array(
        [[c, -s, tx], [s, c, ty], [p1, p2, 1.0]], np.float64
    )


def warp_homography(img: np.ndarray, H: np.ndarray) -> tuple:
    """Inverse-warp img [Hh, Ww, C] by H (centred coords); nearest sampling.

    Returns (warped, valid_mask).
    """
    Hh, Ww = img.shape[:2]
    half = (Ww - 1) / 2.0
    ys, xs = np.mgrid[0:Hh, 0:Ww].astype(np.float64)
    pts = np.stack([xs - half, ys - half, np.ones_like(xs)], -1)  # dest coords
    src = pts @ np.linalg.inv(H).T
    src = src[..., :2] / (src[..., 2:] + 1e-8) + half
    x0 = np.round(src[..., 0]).astype(int)
    y0 = np.round(src[..., 1]).astype(int)
    valid = (x0 >= 0) & (x0 < Ww) & (y0 >= 0) & (y0 < Hh)
    x0c, y0c = np.clip(x0, 0, Ww - 1), np.clip(y0, 0, Hh - 1)
    out = img[y0c, x0c]
    out[~valid] = 0.0
    return out, valid.astype(np.float32)


def min_pool_mask(mask: np.ndarray, factor: int = 8) -> np.ndarray:
    """[F, H, W] -> [F, H/f, W/f]: a latent pixel is valid only if every
    covered image pixel is (train_epi_control.py:540-542 min-pool)."""
    F, H, W = mask.shape
    m = mask.reshape(F, H // factor, factor, W // factor, factor)
    return m.min(axis=(2, 4))


class WebVidFolded:
    """Unposed clips -> folded pseudo-pairs via homography warps.

    root layout: <root>/videos/<clip>/<frame_idx>.png (or .jpg) and
    <root>/captions.json {clip: caption}.
    """

    def __init__(
        self,
        root_path: str,
        sample_n_frames: int = 16,
        sample_size: int = 256,
        seed: Optional[int] = None,
    ):
        self.root = root_path
        self.n = sample_n_frames
        self.size = sample_size
        self.rng = random.Random(seed)
        cap_path = os.path.join(root_path, "captions.json")
        captions = json.load(open(cap_path)) if os.path.exists(cap_path) else {}
        self.clips = []
        for d in sorted(glob.glob(os.path.join(root_path, "videos", "*"))):
            name = os.path.basename(d)
            self.clips.append({"path": d, "caption": captions.get(name, name)})

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, idx: int) -> dict:
        from cvd_tpu.data.realestate10k import _load_frame

        entry = self.clips[idx]
        frames = sorted(
            glob.glob(os.path.join(entry["path"], "*.png"))
            + glob.glob(os.path.join(entry["path"], "*.jpg"))
        )
        assert len(frames) >= self.n, "clip too short"
        start = self.rng.randint(0, len(frames) - self.n)
        imgs = np.stack(
            [_load_frame(p, self.size) for p in frames[start : start + self.n]]
        )  # [F, H, W, 3]

        H = random_homography(self.rng, self.size)
        warped, masks = [], []
        for f in imgs:
            w, m = warp_homography(f, H)
            warped.append(w)
            masks.append(m)
        warped = np.stack(warped)
        masks = np.stack(masks)

        pixel = np.concatenate([imgs, warped], axis=0)  # [2F, H, W, 3]
        full_mask = np.concatenate([np.ones_like(masks), masks], axis=0)
        H_mats = np.tile(H[None].astype(np.float32), (2 * self.n, 1, 1))
        # reverse direction: view-2 pixels map back through H^-1
        H_mats[self.n :] = np.linalg.inv(H).astype(np.float32)
        latent_mask = min_pool_mask(full_mask, 8)[..., None]
        return {
            "pixel_values": pixel,
            "text": entry["caption"],
            "H_mats": H_mats.reshape(2 * self.n, 3, 3),
            "warped_masks": latent_mask.astype(np.float32),
        }


class HybridDataset:
    """Mix posed RealEstate10K pairs with unposed WebVid pseudo-pairs
    (the reference's missing dataset_hybrid_remote, train_epi_control.py:85-89).

    Samples are drawn from dataset A with probability ``ratio_a``; both
    datasets' items keep their own conditioning keys (F_mats vs
    H_mats+warped_masks) — the train step dispatches on what is present.
    """

    def __init__(self, dataset_a, dataset_b, ratio_a: float = 0.5,
                 seed: Optional[int] = None, length: Optional[int] = None):
        self.a, self.b = dataset_a, dataset_b
        self.ratio_a = ratio_a
        self.rng = random.Random(seed)
        self.length = length or (len(dataset_a) + len(dataset_b))

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> dict:
        if self.rng.random() < self.ratio_a:
            return self.a[idx % len(self.a)]
        return self.b[idx % len(self.b)]
