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

Transport hardening: ``_fetch`` retries transient failures with exponential
backoff, resumes partial downloads via HTTP Range from the ``.tmp`` left by
a crashed run, and attaches auth headers from the environment:
  CVD_TPU_REMOTE_TOKEN    -> ``Authorization: Bearer <token>``
  CVD_TPU_REMOTE_HEADERS  -> JSON dict of extra headers

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
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Dict, List, Optional

FETCH_ATTEMPTS = 3
BACKOFF_SECONDS = 1.0


def _auth_headers() -> Dict[str, str]:
    headers: Dict[str, str] = {}
    token = os.environ.get("CVD_TPU_REMOTE_TOKEN")
    if token:
        headers["Authorization"] = f"Bearer {token}"
    extra = os.environ.get("CVD_TPU_REMOTE_HEADERS")
    if extra:
        headers.update(json.loads(extra))
    return headers


def _retryable(e: BaseException) -> bool:
    """Transient transport failures retry; hard 4xx (missing clip, bad
    auth) fail immediately so the dataset's resample loop moves on."""
    if isinstance(e, urllib.error.HTTPError):
        return e.code in (408, 425, 429) or e.code >= 500
    return isinstance(e, (urllib.error.URLError, ConnectionError, TimeoutError, OSError))


def _fetch(url: str, dest: str) -> str:
    """Download url -> dest unless already cached. Atomic via tmp+rename;
    a partial ``.tmp`` from a crashed or failed run resumes via Range."""
    if os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".tmp"
    last: Optional[BaseException] = None
    for attempt in range(FETCH_ATTEMPTS):
        offset = os.path.getsize(tmp) if os.path.exists(tmp) else 0
        headers = _auth_headers()
        if offset:
            headers["Range"] = f"bytes={offset}-"
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req) as r:
                status = getattr(r, "status", None)
                resumed = offset and status == 206
                mode = "ab" if resumed else "wb"
                with open(tmp, mode) as f:
                    while True:
                        chunk = r.read(1 << 20)
                        if not chunk:
                            break
                        f.write(chunk)
            os.replace(tmp, dest)
            return dest
        except urllib.error.HTTPError as e:
            # server refused the Range (e.g. 416 or file:// style handlers):
            # drop the partial and take a clean attempt
            if offset and e.code in (416, 501):
                os.remove(tmp)
                last = e
            elif not _retryable(e):
                raise
            else:
                last = e
        except Exception as e:  # noqa: BLE001
            if not _retryable(e):
                raise
            last = e
        if attempt < FETCH_ATTEMPTS - 1:
            time.sleep(BACKOFF_SECONDS * (2**attempt))
    raise IOError(f"fetch failed after {FETCH_ATTEMPTS} attempts: {url}") from last


def _join(base: str, *parts: str) -> str:
    return base.rstrip("/") + "/" + "/".join(
        urllib.parse.quote(p) for p in parts
    )


class RealEstate10KPoseFoldedRemote:
    """Streaming RealEstate10K folded pairs (dataset_realestate10k_remote).

    Downloads the split index + captions eagerly (tiny), pose files and
    mp4s lazily per __getitem__ into ``cache_dir``, then reuses the local
    dataset's clip logic (mp4 decode, folding, F-matrices). Newly fetched
    clips are appended to the ONE local dataset's index incrementally —
    no O(N^2) re-scan, and the local frame-sampling rng is never reseeded."""

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
        self._captions = json.load(open(os.path.join(
            self.cache, "annotation_json", f"{split}_captions.json")))
        # one local dataset over the cache; grows incrementally as clips land
        self._local = RealEstate10KPoseFolded(
            root_path=self.cache, sample_stride=sample_stride,
            sample_n_frames=sample_n_frames, sample_size=sample_size,
            seed=seed,
        )
        self._name2idx: Dict[str, int] = {
            e["clip_name"]: i for i, e in enumerate(self._local.dataset)
        }

    def __len__(self) -> int:
        return len(self.clips)

    def _ensure(self, clip: str) -> None:
        pose = _fetch(
            _join(self.base_url, "RealEstate10K", self.split, clip + ".txt"),
            os.path.join(self.cache, "RealEstate10K", self.split,
                         clip + ".txt"),
        )
        _fetch(_join(self.base_url, "dataset", self.split, clip + ".mp4"),
               os.path.join(self.cache, "dataset", self.split, clip + ".mp4"))
        if clip not in self._name2idx:
            caption = self._captions.get(clip + ".mp4")
            if caption is None:
                raise KeyError(f"clip {clip} has no caption in the remote "
                               f"{self.split}_captions.json")
            self._local.dataset.append({
                "clip_name": clip,
                "clip_path": os.path.join(self.cache, "dataset", self.split,
                                          clip),
                "pose_file": pose,
                "caption": caption[0],
            })
            self._name2idx[clip] = len(self._local.dataset) - 1

    def __getitem__(self, idx: int) -> dict:
        clip = self.clips[idx % len(self.clips)]
        self._ensure(clip)
        return self._local[self._name2idx[clip]]


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
        self._captions = json.load(
            open(os.path.join(self.cache, "captions.json")))
        self._local = WebVidFolded(
            root_path=self.cache, sample_n_frames=sample_n_frames,
            sample_size=sample_size, seed=seed,
        )
        self._name2idx: Dict[str, int] = {
            os.path.basename(e["path"]): i
            for i, e in enumerate(self._local.clips)
        }

    def __len__(self) -> int:
        return len(self.clips)

    def __getitem__(self, idx: int) -> dict:
        name, n_frames = self.clips[idx % len(self.clips)][0], int(
            self.clips[idx % len(self.clips)][1]
        )
        for i in range(n_frames):
            _fetch(_join(self.base_url, "videos", name, f"{i:04d}.png"),
                   os.path.join(self.cache, "videos", name, f"{i:04d}.png"))
        if name not in self._name2idx:
            self._local.clips.append({
                "path": os.path.join(self.cache, "videos", name),
                "caption": self._captions.get(name, name),
            })
            self._name2idx[name] = len(self._local.clips) - 1
        return self._local[self._name2idx[name]]
