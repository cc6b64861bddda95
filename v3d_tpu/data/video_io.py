"""Video IO via OpenCV (replacement for mediapy/imageio-ffmpeg use at
scripts/pub/V3D_512.py:306 and recon/train_from_vid.py:367-370)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def write_video(path: str, frames: np.ndarray, fps: int = 3) -> None:
    """frames: (T, H, W, 3) uint8 RGB."""
    assert cv2 is not None, "cv2 required for video IO"
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames * 255, 0, 255).astype(np.uint8)
    h, w = frames.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    try:
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()


def read_video(path: str) -> np.ndarray:
    """-> (T, H, W, 3) uint8 RGB."""
    assert cv2 is not None, "cv2 required for video IO"
    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    if not frames:
        raise IOError(f"no frames read from {path}")
    return np.stack(frames)


def save_image_grid(path: str, frames: np.ndarray, cols: Optional[int] = None) -> None:
    """sgm/util.py video_frames_as_grid equivalent."""
    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = np.clip(frames * 255, 0, 255).astype(np.uint8)
    t, h, w, c = frames.shape
    cols = cols or t
    rows = -(-t // cols)
    grid = np.zeros((rows * h, cols * w, c), np.uint8)
    for i, f in enumerate(frames):
        r, cc = divmod(i, cols)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = f
    from PIL import Image

    Image.fromarray(grid).save(path)
