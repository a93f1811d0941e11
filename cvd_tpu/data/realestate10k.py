"""RealEstate10K training dataset with the folded-video trick.

Re-derivation of ``RealEstate10KPoseFolded``
(dataset_train_realestate10k.py:212-517): sample 2N-1 frames of one clip,
treat the centre frame as a shared start, fold into two N-frame videos
diverging from it, and emit pixel values + Plücker embeddings + per-frame
fundamental matrices (plus transposes for the reverse direction).

Layout differences vs the reference: channels-last numpy arrays
(pixel_values [2N, H, W, 3] in [-1, 1], plucker [2N, H, W, 6]); everything
else (frame indexing, intrinsics rescale, relative poses, retry loop) follows
the reference's math.
"""
from __future__ import annotations

import glob
import json
import os
import random
from typing import List, Optional, Sequence

import numpy as np

from cvd_tpu.geometry.cameras import Camera, intrinsics_for_crop, parse_pose_file, relative_poses
from cvd_tpu.geometry.folding import fold_indices, folded_pair_F_mats
from cvd_tpu.geometry.plucker import ray_condition
from cvd_tpu.geometry.trajectories import interpolate_pose_batch


def _transform_frame(img, sample_size: int) -> np.ndarray:
    """Resize short side, centre crop, scale to [-1,1]. img: PIL Image or
    uint8 RGB array."""
    from PIL import Image

    if not isinstance(img, Image.Image):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    w, h = img.size
    scale = sample_size / min(w, h)
    img = img.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    w, h = img.size
    left, top = (w - sample_size) // 2, (h - sample_size) // 2
    img = img.crop((left, top, left + sample_size, top + sample_size))
    arr = np.asarray(img, np.float32) / 255.0
    return arr * 2.0 - 1.0


def _load_frame(path: str, sample_size: int) -> np.ndarray:
    """Read a frame png/jpg, resize short side, centre crop, scale to [-1,1]."""
    from PIL import Image

    with Image.open(path) as img:
        return _transform_frame(img, sample_size)


def read_video_frames(path: str, indices) -> tuple:
    """Decode the given ORDINAL frames of a video via OpenCV (the mp4
    ingestion the reference does with decord,
    dataset_train_realestate10k.py:11,386-460). Returns
    (frames RGB uint8 in the order of ``indices``, (H, W))."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    want = sorted({int(i) for i in indices})
    out = {}
    pos = 0
    try:
        while want:
            ok = cap.grab()
            if not ok:
                break
            if pos == want[0]:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                out[pos] = frame[..., ::-1].copy()  # BGR -> RGB
                want.pop(0)
            pos += 1
    finally:
        cap.release()
    if want:
        raise IOError(f"{path}: frames {want} past end of video ({pos} read)")
    first = out[next(iter(out))]
    return [out[int(i)] for i in indices], first.shape[:2]


class RealEstate10KPoseFolded:
    """root layout (matching the reference, :242-256):
      <root>/RealEstate10K/train/<clip>.txt        pose files
      <root>/dataset/train/<clip>/<cid>.png        extracted frames
      <root>/annotation_json/{train,test}_captions.json
    """

    def __init__(
        self,
        root_path: str,
        sample_stride: int = 2,
        minimum_sample_stride: int = 1,
        sample_n_frames: int = 16,
        relative_pose: bool = True,
        sample_size: int = 256,
        return_clip_name: bool = False,
        validation_video_split: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        self.root_path = root_path
        self.sample_stride = sample_stride
        self.minimum_sample_stride = minimum_sample_stride
        self.sample_n_frames = sample_n_frames
        self.sample_size = sample_size
        self.return_clip_name = return_clip_name
        self.validation_video_split = validation_video_split
        self.rng = random.Random(seed)

        txt_dir = os.path.join(root_path, "RealEstate10K", "train")
        video_dir = os.path.join(root_path, "dataset", "train")
        captions = {}
        for name in ("train_captions.json", "test_captions.json"):
            p = os.path.join(root_path, "annotation_json", name)
            if os.path.exists(p):
                captions.update(json.load(open(p)))
        self.dataset: List[dict] = []
        for pose_file in sorted(glob.glob(os.path.join(txt_dir, "*.txt"))):
            clip = os.path.basename(pose_file)[: -len(".txt")]
            key = clip + ".mp4"
            if key not in captions:
                continue
            self.dataset.append(
                {
                    "clip_name": clip,
                    "clip_path": os.path.join(video_dir, clip),
                    "pose_file": pose_file,
                    "caption": captions[key][0],
                }
            )

    def __len__(self) -> int:
        return len(self.dataset)

    def _get_clip(self, idx: int) -> dict:
        entry = self.dataset[idx]
        cams = parse_pose_file(entry["pose_file"])
        n = self.sample_n_frames
        sample_length = 2 * n - 1
        total = len(cams)
        assert total >= sample_length, "clip too short"
        stride = max(min(total // sample_length, self.sample_stride),
                     self.minimum_sample_stride)
        clip_length = min(total, (sample_length - 1) * stride + 1)
        start = self.rng.randint(0, total - clip_length)
        frame_ids = np.linspace(start, start + clip_length - 1, sample_length).astype(int)

        # frames come from either pre-extracted pngs (<clip>/<cid>.png) or
        # the clip's mp4 read by ordinal index (reference decord behavior)
        mp4_path = entry["clip_path"] + ".mp4"
        use_mp4 = (not os.path.isdir(entry["clip_path"])
                   and os.path.exists(mp4_path))
        raw_frames = None
        if use_mp4:
            raw_frames, (H0, W0) = read_video_frames(mp4_path, frame_ids)

        imgs, c2ws, Ks, intr = [], [], [], []
        for k, fid in enumerate(frame_ids):
            cam = cams[fid]
            if use_mp4:
                img = _transform_frame(raw_frames[k], self.sample_size)
            else:
                img_path = os.path.join(
                    entry["clip_path"], "%d.png" % int(cam.cid)
                )
                img = _load_frame(img_path, self.sample_size)
                # original image size needed for K rescale
                from PIL import Image

                with Image.open(img_path) as im:
                    W0, H0 = im.size
            K, ii = intrinsics_for_crop(cam, H0, W0, self.sample_size)
            imgs.append(img)
            c2ws.append(cam.c2w)
            Ks.append(K)
            intr.append(ii)

        c2w = relative_poses(np.array(c2ws), tar_idx=n - 1)
        K = np.array(Ks)
        intr = np.array(intr, np.float32)

        plucker = np.asarray(
            ray_condition(intr[None], c2w[None].astype(np.float32),
                          self.sample_size, self.sample_size)[0]
        )
        F_mats = folded_pair_F_mats(c2w, K, n)
        fold = fold_indices(n)

        sample = {
            "pixel_values": np.stack(imgs)[fold],  # [2n, H, W, 3]
            "text": entry["caption"],
            "plucker_embedding": plucker[fold],  # [2n, H, W, 6]
            "F_mats": F_mats,  # [2n, 3, 3]
            "ret_c2w": c2w[fold].astype(np.float32),
            "ret_K_mats": K[fold].astype(np.float32),
        }
        if self.validation_video_split and self.validation_video_split != 2:
            folded_c2w = c2w[fold]
            inter = interpolate_pose_batch(
                folded_c2w[:n], folded_c2w[n:], self.validation_video_split
            )
            intr_f = intr[fold][:n]
            intr_i = np.tile(intr_f, (self.validation_video_split, 1))
            sample["plucker_embedding"] = np.asarray(
                ray_condition(intr_i[None], inter[None].astype(np.float32),
                              self.sample_size, self.sample_size)[0]
            )
            sample["ret_c2w"] = inter.astype(np.float32)
            sample["ret_K_mats"] = np.tile(
                K[fold][:n], (self.validation_video_split, 1, 1)
            ).astype(np.float32)
        if self.return_clip_name:
            sample["clip_name"] = entry["clip_name"]
        return sample

    def __getitem__(self, idx: int) -> dict:
        # retry-with-resample loop (reference :488-499)
        for attempt in range(31):
            try:
                return self._get_clip(idx)
            except Exception:
                if attempt == 30:
                    raise
                idx = self.rng.randrange(len(self.dataset))
        raise RuntimeError("unreachable")
