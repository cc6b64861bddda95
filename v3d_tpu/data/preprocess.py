"""Input-image preprocessing for generation.

Counterpart of scripts/pub/V3D_512.py:200-227: background removal -> recenter
with a border margin (kiui.op.recenter semantics) -> alpha-composite onto
white -> resize 512 -> scale to [-1, 1].

rembg/onnxruntime are not available in this environment; background removal
accepts any callable with the rembg signature (image -> RGBA) and falls back
to a luminance-threshold matte when none is supplied.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def recenter(image: np.ndarray, mask: np.ndarray,
             border_ratio: float = 0.2) -> np.ndarray:
    """kiui.op.recenter: crop to the mask bbox and paste centered into a
    square canvas with ``border_ratio`` margin (V3D_512.py:18,215)."""
    H, W = image.shape[:2]
    C = 1 if image.ndim == 2 else image.shape[2]
    size = max(H, W)
    result = np.zeros((size, size, C), dtype=image.dtype)
    coords = np.nonzero(mask)
    if len(coords[0]) == 0:
        return image
    x_min, x_max = coords[0].min(), coords[0].max()
    y_min, y_max = coords[1].min(), coords[1].max()
    h, w = x_max - x_min, y_max - y_min
    if h == 0 or w == 0:
        return image
    desired = int(size * (1 - border_ratio))
    scale = desired / max(h, w)
    h2, w2 = int(h * scale), int(w * scale)
    x2 = (size - h2) // 2
    y2 = (size - w2) // 2
    crop = image[x_min:x_max, y_min:y_max]
    if cv2 is not None:
        resized = cv2.resize(crop, (w2, h2), interpolation=cv2.INTER_AREA)
    else:
        yi = (np.linspace(0, crop.shape[0] - 1, h2)).astype(int)
        xi = (np.linspace(0, crop.shape[1] - 1, w2)).astype(int)
        resized = crop[yi][:, xi]
    if resized.ndim == 2:
        resized = resized[..., None]
    result[x2:x2 + h2, y2:y2 + w2] = resized.reshape(h2, w2, C)
    return result


def luminance_matte(image: np.ndarray, threshold: int = 250) -> np.ndarray:
    """Fallback 'background removal': treat near-white pixels as background.
    Returns RGBA uint8.  For production use, pass a real matting callable
    (e.g. rembg) to ``preprocess_image``."""
    rgb = image[..., :3]
    bg = np.all(rgb >= threshold, axis=-1)
    alpha = np.where(bg, 0, 255).astype(np.uint8)
    return np.concatenate([rgb.astype(np.uint8), alpha[..., None]], axis=-1)


_DEFAULT_MATTE: list = []  # lazy singleton: [callable-or-None]


def default_remove_bg() -> Optional[Callable]:
    """The production matting callable: the flax U2Net port (rembg's model,
    models/u2net.py) when its weights are on disk, else None (callers fall
    back to the luminance matte, loudly)."""
    if not _DEFAULT_MATTE:
        from v3d_tpu.models.u2net import load_u2net

        fn = load_u2net()
        if fn is None:
            import sys

            print("[preprocess] no U2Net weights found (ckpts/u2net*.pth or "
                  "$V3D_U2NET_CKPT): background removal falls back to a "
                  "near-white luminance matte", file=sys.stderr)
        _DEFAULT_MATTE.append(fn)
    return _DEFAULT_MATTE[0]


def preprocess_image(image: np.ndarray, border_ratio: float = 0.3,
                     resolution: int = 512,
                     remove_bg: Optional[Callable] = None,
                     ignore_alpha: bool = False) -> np.ndarray:
    """Full CLI preprocessing (V3D_512.py:200-227).

    ``image``: (H, W, 3|4) uint8.  Returns (resolution, resolution, 3)
    float32 in [-1, 1]."""
    image = np.asarray(image)
    if border_ratio > 0:
        if image.shape[-1] != 4 or ignore_alpha:
            matte = remove_bg or default_remove_bg() or luminance_matte
            rgba = matte(image[..., :3])
        else:
            rgba = image
        mask = rgba[..., -1] > 0
        image = recenter(rgba, mask, border_ratio=border_ratio)
        imf = image.astype(np.float32) / 255.0
        if imf.shape[-1] == 4:
            imf = imf[..., :3] * imf[..., 3:4] + (1 - imf[..., 3:4])
    else:
        imf = image[..., :3].astype(np.float32) / 255.0
    if cv2 is not None:
        imf = cv2.resize(imf, (resolution, resolution),
                         interpolation=cv2.INTER_LINEAR)
    else:
        yi = np.linspace(0, imf.shape[0] - 1, resolution).astype(int)
        xi = np.linspace(0, imf.shape[1] - 1, resolution).astype(int)
        imf = imf[yi][:, xi]
    return imf * 2.0 - 1.0
