"""Remote (streaming) dataset variants.

The reference imports ``dataset_realestate10k_remote`` /
``dataset_webvid10m_remote`` which are absent from its release
(train_epi_control.py:79-89); only the call-site contract survives: same
item dicts as the local datasets, data fetched from remote storage. This
implementation streams per-clip artifacts (pose txt + mp4/frames) from any
URL scheme ``urllib`` can open (https, gs via signed URLs, file for tests)
into a local cache directory on first touch, then delegates to the local
dataset logic — so the training loop, folding, and retry behavior are
shared, not duplicated.

Layout expected under ``base_url`` (mirrors the local root):
    <base>/RealEstate10K/<split>/index.txt        one clip name per line
    <base>/RealEstate10K/<split>/<clip>.txt       pose files
    <base>/dataset/<split>/<clip>.mp4             videos
    <base>/annotation_json/<split>_captions.json
WebVid:
    <base>/index.txt, <base>/captions.json, <base>/videos/<clip>/<i>.png
"""
from __future__ import annotations

import json
import os
import urllib.parse
import urllib.request
from typing import List, Optional


def _fetch(url: str, dest: str) -> str:
    """Download url -> dest unless already cached. Atomic via tmp+rename."""
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            f.write(chunk)
    os.replace(tmp, dest)
    return dest


def _join(base: str, *parts: str) -> str:
    return base.rstrip("/") + "/" + "/".join(
        urllib.parse.quote(p) for p in parts
    )


class RealEstate10KPoseFoldedRemote:
    """Streaming RealEstate10K folded pairs (dataset_realestate10k_remote).

    Downloads the split index + captions eagerly (tiny), pose files and
    mp4s lazily per __getitem__ into ``cache_dir``, then reuses the local
    dataset's clip logic (mp4 decode, folding, F-matrices)."""

    def __init__(self, base_url: str, cache_dir: Optional[str] = None,
                 split: str = "train", sample_stride: int = 2,
                 sample_n_frames: int = 16, sample_size: int = 256,
                 seed: Optional[int] = None):
        from cvd_tpu.data.realestate10k import RealEstate10KPoseFolded

        self.base_url = base_url
        self.split = split
        self.cache = cache_dir or os.path.expanduser(
            "~/.cache/cvd_tpu_data/re10k"
        )
        idx = _fetch(_join(base_url, "RealEstate10K", split, "index.txt"),
                     os.path.join(self.cache, "RealEstate10K", split,
                                  "index.txt"))
        self.clips: List[str] = [
            l.strip() for l in open(idx) if l.strip()
        ]
        _fetch(_join(base_url, "annotation_json", f"{split}_captions.json"),
               os.path.join(self.cache, "annotation_json",
                            f"{split}_captions.json"))
        captions = json.load(open(os.path.join(
            self.cache, "annotation_json", f"{split}_captions.json")))
        self._local_cls = RealEstate10KPoseFolded
        self._local: Optional[object] = None
        self._captions = captions
        self._kw = dict(sample_stride=sample_stride,
                        sample_n_frames=sample_n_frames,
                        sample_size=sample_size, seed=seed)

    def __len__(self) -> int:
        return len(self.clips)

    def _ensure(self, clip: str) -> None:
        _fetch(_join(self.base_url, "RealEstate10K", self.split, clip + ".txt"),
               os.path.join(self.cache, "RealEstate10K", self.split,
                            clip + ".txt"))
        _fetch(_join(self.base_url, "dataset", self.split, clip + ".mp4"),
               os.path.join(self.cache, "dataset", self.split, clip + ".mp4"))

    def _find(self, clip: str):
        if self._local is None:
            return None
        for i, entry in enumerate(self._local.dataset):
            if entry["clip_name"] == clip:
                return self._local[i]
        return None

    def __getitem__(self, idx: int) -> dict:
        clip = self.clips[idx % len(self.clips)]
        self._ensure(clip)
        item = self._find(clip)
        if item is None:
            # clip just arrived: rebuild the local index over the cache
            self._local = self._local_cls(root_path=self.cache, **self._kw)
            item = self._find(clip)
        if item is None:
            raise KeyError(f"clip {clip} not indexable after fetch")
        return item


class WebVid10MRemote:
    """Streaming WebVid-style unposed clips (dataset_webvid10m_remote)."""

    def __init__(self, base_url: str, cache_dir: Optional[str] = None,
                 sample_n_frames: int = 16, sample_size: int = 256,
                 seed: Optional[int] = None):
        from cvd_tpu.data.webvid import WebVidFolded

        self.base_url = base_url
        self.cache = cache_dir or os.path.expanduser(
            "~/.cache/cvd_tpu_data/webvid"
        )
        idx = _fetch(_join(base_url, "index.txt"),
                     os.path.join(self.cache, "index.txt"))
        self.clips = [l.strip().split() for l in open(idx) if l.strip()]
        _fetch(_join(base_url, "captions.json"),
               os.path.join(self.cache, "captions.json"))
        self._cls = WebVidFolded
        self._kw = dict(sample_n_frames=sample_n_frames,
                        sample_size=sample_size, seed=seed)
        self._local = None

    def __len__(self) -> int:
        return len(self.clips)

    def _find(self, name: str):
        if self._local is None:
            return None
        for i, entry in enumerate(self._local.clips):
            if os.path.basename(entry["path"]) == name:
                return self._local[i]
        return None

    def __getitem__(self, idx: int) -> dict:
        name, n_frames = self.clips[idx % len(self.clips)][0], int(
            self.clips[idx % len(self.clips)][1]
        )
        for i in range(n_frames):
            _fetch(_join(self.base_url, "videos", name, f"{i:04d}.png"),
                   os.path.join(self.cache, "videos", name, f"{i:04d}.png"))
        item = self._find(name)
        if item is None:
            self._local = self._cls(root_path=self.cache, **self._kw)
            item = self._find(name)
        if item is None:
            raise KeyError(name)
        return item
