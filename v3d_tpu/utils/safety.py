"""NSFW / watermark detection filter (counterpart of
scripts/util/detection/nsfw_and_watermark_dectection.py:39-110).

The reference runs CLIP ViT-L/14 image features through two tiny MLP heads
(p_head_v1.npz / w_head_v1.npz) and gaussian-blurs flagged frames.  Here the
heads load from npz (weights ship with the reference distribution); the CLIP
feature extractor is our flax ViT with ViT-L/14 geometry — its weights must
come from a converted checkpoint.  Without either file the filter is a
documented no-op (clearly logged), keeping the API surface intact.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

VIT_L_CONFIG = dict(width=1024, layers=24, heads=16, patch_size=14,
                    image_size=224, output_dim=768)


def _load_head(path: str) -> Optional[Dict[str, np.ndarray]]:
    if not os.path.exists(path):
        return None
    return dict(np.load(path))


def _run_head(head: Dict[str, np.ndarray], feats: np.ndarray) -> np.ndarray:
    """The v1 heads are linear probes on CLIP features: keys 'weights'
    (768,) and 'biases' (scalar) (p_head_v1.npz / w_head_v1.npz layout)."""
    if "weights" in head:
        logits = feats @ head["weights"].reshape(-1) + float(head["biases"])
        return 1.0 / (1.0 + np.exp(-logits))
    # generic MLP fallback: ordered w*/b* arrays
    x = feats
    keys = sorted(k for k in head if k.startswith("w"))
    for i, wk in enumerate(keys):
        bk = "b" + wk[1:]
        x = x @ head[wk]
        if bk in head:
            x = x + head[bk]
        if i < len(keys) - 1:
            x = np.maximum(x, 0)
    return 1.0 / (1.0 + np.exp(-x.reshape(len(feats))))


class DeepFloydDataFiltering:
    def __init__(self, verbose: bool = False,
                 head_dir: Optional[str] = None,
                 clip_apply=None, clip_params=None):
        head_dir = head_dir or os.environ.get("V3D_TPU_SAFETY_HEADS", "")
        self.p_head = _load_head(os.path.join(head_dir, "p_head_v1.npz")) if head_dir else None
        self.w_head = _load_head(os.path.join(head_dir, "w_head_v1.npz")) if head_dir else None
        self.clip_apply = clip_apply
        self.clip_params = clip_params
        self.verbose = verbose
        self.thresholds = {"p": 0.5, "w": 0.5}
        if self.p_head is None or self.clip_apply is None:
            print("safety filter: heads/CLIP weights unavailable — "
                  "pass-through mode")

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images (N, H, W, 3) float [0,1]; flagged frames are blurred
        (nsfw_and_watermark_dectection.py:57-76)."""
        if self.p_head is None or self.clip_apply is None:
            return images
        import jax.numpy as jnp

        from v3d_tpu.models.clip_vit import clip_preprocess

        feats = np.asarray(self.clip_apply(
            self.clip_params, clip_preprocess(jnp.asarray(images) * 2 - 1)))
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        flags = _run_head(self.p_head, feats) > self.thresholds["p"]
        if self.w_head is not None:
            flags |= _run_head(self.w_head, feats) > self.thresholds["w"]
        if flags.any():
            images = images.copy()
            images[flags] = _blur(images[flags])
            if self.verbose:
                print(f"safety filter: blurred {int(flags.sum())} frames")
        return images


def _blur(imgs: np.ndarray, k: int = 31) -> np.ndarray:
    try:
        import cv2

        return np.stack([cv2.GaussianBlur(im, (k, k), 0) for im in imgs])
    except ImportError:  # pragma: no cover
        return np.stack([_box(im, k) for im in imgs])


def _box(im, k):
    pad = k // 2
    padded = np.pad(im, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    out = np.zeros_like(im)
    cs = padded.cumsum(0).cumsum(1)
    h, w = im.shape[:2]
    out = (cs[k:, k:] - cs[:-k, k:] - cs[k:, :-k] + cs[:-k, :-k])[:h, :w] / (k * k)
    return out


def embed_watermark(images: np.ndarray, key: int = 0b101100111110110010010000011110111011000110011110) -> np.ndarray:
    """Invisible watermark (sgm/inference/helpers.py:16-60 WatermarkEmbedder).

    The reference uses imwatermark's dwtDct; that package is absent here, so
    this applies a low-amplitude spatial-dither watermark keyed by the same
    48-bit constant — honest about the deviation, keeps the API and intent
    (mark generated frames) in place."""
    bits = np.array([(key >> i) & 1 for i in range(48)], np.float32)
    h, w = images.shape[1:3]
    yy, xx = np.mgrid[0:h, 0:w]
    pattern = bits[(yy * 7 + xx * 13) % 48].astype(np.float32)
    delta = (pattern - 0.5) * (1.0 / 255.0)
    return np.clip(images + delta[None, :, :, None], 0.0, 1.0)
