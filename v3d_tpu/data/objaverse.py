"""Orbit-video training datasets (counterpart of sgm/data/objaverse.py).

The reference's primary trainer input is ``GObjaverse`` (objaverse.py:188):
24 orbit renders per object (or precomputed latents256/clip_emb256), from
which a training item is built as

  frames / latents      (T, ...)          target views
  cond_frames_without_noise = front view  (CLIP input)
  cond_frames           = front view + cond_aug * N(0,1)
  fps_id / motion_bucket_id / cond_aug    broadcast x T
  image_only_indicator  zeros(T)

and ``video_collate_fn`` (objaverse.py:166) flattens (b, t, ...) -> (b*t, ...)
for frame-level fields while stacking per-video fields.

Here: ``OrbitRenderDataset`` reads per-object directories of rendered frames
(NNN.png [+ NNN_latent.npy]), ``SyntheticOrbitDataset`` generates procedural
data for tests/benchmarks, and both share the item-assembly and collate
logic.  Iteration is plain Python (host-side) feeding the pjit train step;
heavy lifting (VAE encode) is done on-device by the caller when latents are
not precomputed.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class OrbitItemConfig:
    num_frames: int = 18
    cond_aug: float = 0.02
    fps_id: float = 1.0
    motion_bucket_id: float = 300.0
    # front-view selection (objaverse.py:236-282): "first" | "random"
    frontview: str = "first"


def assemble_item(frames_or_latents: np.ndarray, cfg: OrbitItemConfig,
                  rng: np.random.RandomState,
                  clip_emb: Optional[np.ndarray] = None,
                  is_latent: bool = False) -> Dict:
    """Build one training example from (T, H, W, C) views."""
    t = cfg.num_frames
    data = frames_or_latents[:t]
    if cfg.frontview == "random":
        front_idx = int(rng.randint(len(data)))
        data = np.roll(data, -front_idx, axis=0)
    cond = data[0]
    cond_noisy = cond + cfg.cond_aug * rng.randn(*cond.shape).astype(cond.dtype)
    item = {
        ("latents" if is_latent else "frames"): data,
        "cond_frames_without_noise": cond if clip_emb is None else clip_emb,
        "cond_frames": cond_noisy,
        "fps_id": np.full((t,), cfg.fps_id, np.float32),
        "motion_bucket_id": np.full((t,), cfg.motion_bucket_id, np.float32),
        "cond_aug": np.full((t,), cfg.cond_aug, np.float32),
        "image_only_indicator": np.zeros((t,), np.float32),
        "num_video_frames": t,
    }
    return item


# fields flattened (b, t, ...) -> (b*t, ...) by the video collate
# (FLATTEN_FIELDS + frames/latents handling, objaverse.py:163-186)
_FRAME_FIELDS = ("frames", "latents", "fps_id", "motion_bucket_id",
                 "cond_aug", "image_only_indicator", "elevation")


def _collate_default(vals):
    if isinstance(vals[0], dict):
        return {k: _collate_default([v[k] for v in vals]) for k in vals[0]}
    if isinstance(vals[0], str):
        return list(vals)
    return np.stack(vals)


def video_collate(items: Sequence[Dict]) -> Dict:
    """objaverse.py:166-186 video_collate_fn: frame-level fields flatten
    (b, t, ...) -> (b*t, ...); per-video fields stack; nested dicts
    (pixelnerf_input) stack recursively with their 'rgb' flattened."""
    out: Dict = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if key == "num_video_frames":
            out[key] = vals[0]
        elif key in _FRAME_FIELDS:
            stacked = np.stack(vals)                     # (b, t, ...)
            out[key] = stacked.reshape((-1,) + stacked.shape[2:])
        else:
            out[key] = _collate_default(vals)
    if "image_only_indicator" in out:
        t = out["num_video_frames"]
        out["image_only_indicator"] = out["image_only_indicator"].reshape(-1, t)
    if "pixelnerf_input" in out:
        rgb = out["pixelnerf_input"]["rgb"]              # (b, t, ...)
        out["pixelnerf_input"]["rgb"] = rgb.reshape((-1,) + rgb.shape[2:])
    return out


def _decode_orbit(pngs: Sequence[str]) -> np.ndarray:
    """Decode an orbit's frames -> (t, h, w, 3) float32 in [0, 255].  Uses
    the native threaded decoder (native/imgdec.cc) when available — the
    torch-DataLoader-workers analog — and falls back to PIL."""
    from v3d_tpu.native.imgdec import decode_batch, decode_image

    first = decode_image(pngs[0])
    if first is not None:
        out = decode_batch(pngs, first.shape[:2])
        if out is not None and out[1].all():
            return out[0][..., :3].astype(np.float32)
    from PIL import Image

    return np.stack([
        np.asarray(Image.open(p).convert("RGB"), np.float32) for p in pngs])


class OrbitRenderDataset:
    """Directory-of-objects dataset:

        root/<object_id>/{000.png ... 0TT.png}            rendered orbit
        root/<object_id>/latents.npy     (optional, (T, h, w, 4) pre-encoded)
        root/<object_id>/clip_emb.npy    (optional, (1, d))

    Mirrors GObjaverse's latents256/clip_emb256 shortcut (objaverse.py:
    328-351) and its corrupt-item fallback to index 0 (objaverse.py:294-306).
    """

    def __init__(self, root: str, cfg: OrbitItemConfig = OrbitItemConfig(),
                 seed: int = 0):
        self.root = root
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.objects = sorted(
            d for d in glob.glob(os.path.join(root, "*")) if os.path.isdir(d))
        if not self.objects:
            raise FileNotFoundError(f"no object dirs under {root}")

    def __len__(self) -> int:
        return len(self.objects)

    def _load(self, idx: int) -> Dict:
        obj = self.objects[idx]
        lat_path = os.path.join(obj, "latents.npy")
        clip_path = os.path.join(obj, "clip_emb.npy")
        clip_emb = np.load(clip_path) if os.path.exists(clip_path) else None
        if os.path.exists(lat_path):
            lat = np.load(lat_path).astype(np.float32)
            return assemble_item(lat, self.cfg, self.rng, clip_emb,
                                 is_latent=True)
        pngs = sorted(glob.glob(os.path.join(obj, "*.png")))
        frames = _decode_orbit(pngs) / 127.5 - 1.0
        return assemble_item(frames.astype(np.float32), self.cfg, self.rng,
                             clip_emb)

    def __getitem__(self, idx: int) -> Dict:
        try:
            return self._load(idx)
        except Exception:
            # corrupt-item fallback (objaverse.py:294-306)
            return self._load(0)

    def iter_batches(self, batch_size: int, shuffle: bool = True) -> Iterator[Dict]:
        order = np.arange(len(self))
        while True:
            if shuffle:
                self.rng.shuffle(order)
            for s in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[int(i)] for i in order[s:s + batch_size]]
                yield video_collate(items)


class SyntheticOrbitDataset:
    """Procedural latent orbits for tests and train-throughput benchmarks."""

    def __init__(self, num_objects: int = 8, num_frames: int = 18,
                 latent_hw: int = 64, cfg: Optional[OrbitItemConfig] = None,
                 seed: int = 0):
        self.cfg = cfg or OrbitItemConfig(num_frames=num_frames)
        self.rng = np.random.RandomState(seed)
        self.latents = self.rng.randn(
            num_objects, num_frames, latent_hw, latent_hw, 4).astype(np.float32)

    def __len__(self) -> int:
        return len(self.latents)

    def __getitem__(self, idx: int) -> Dict:
        return assemble_item(self.latents[idx], self.cfg, self.rng,
                             is_latent=True)

    def iter_batches(self, batch_size: int) -> Iterator[Dict]:
        n = len(self)
        while True:
            idx = self.rng.randint(0, n, batch_size)
            yield video_collate([self[int(i)] for i in idx])
