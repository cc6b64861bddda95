"""Monocular normal supervision (counterpart of mesh_recon/utils/dpt.py —
the Omnidata DPT normal predictor — and the midas->blender->opencv->world
transforms of datasets/v3d.py:177-205).

The DPT checkpoint (omnidata_dpt_normal_v2) is downloaded from HF by the
reference; this environment has no egress, so:
- ``NormalPredictor`` is the interface; ``load_dpt_normal_predictor`` loads a
  converted checkpoint when one is provided (V3D_TPU_DPT_WEIGHTS);
- ``normals_from_mask_distance`` is the built-in fallback: smooth
  silhouette-distance normals — far weaker than DPT but it exercises the
  full supervision path;
- ``camera_normals_to_world`` implements the exact coordinate chain the
  reference applies to DPT outputs.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def camera_normals_to_world(normals_cam: np.ndarray, c2w: np.ndarray,
                            flip_yz: bool = True) -> np.ndarray:
    """datasets/v3d.py:177-205: DPT outputs normals in a midas camera frame;
    map [0,1]->[-1,1], flip to OpenCV, rotate into world."""
    n = normals_cam * 2.0 - 1.0 if normals_cam.max() > 1.0 + 1e-6 or (
        normals_cam.min() >= 0) else normals_cam
    if flip_yz:
        n = n * np.array([1.0, -1.0, -1.0], np.float32)
    return n @ c2w[:3, :3].T


def normals_from_mask_distance(masks: np.ndarray, c2ws: np.ndarray,
                               blur: int = 7) -> np.ndarray:
    """Fallback per-frame normals: gradient of the blurred silhouette
    distance transform, lifted to world space per camera.  (T,H,W) masks ->
    (T,H,W,3) world normals."""
    try:
        import cv2
    except ImportError:
        cv2 = None
    out = []
    for mask, c2w in zip(masks, c2ws):
        m = (mask > 0.5).astype(np.uint8)
        if cv2 is not None:
            dist = cv2.distanceTransform(m, cv2.DIST_L2, 5).astype(np.float32)
            dist = cv2.GaussianBlur(dist, (blur, blur), 0)
            gy, gx = np.gradient(dist)
        else:
            gy, gx = np.gradient(m.astype(np.float32))
        # screen-space gradient -> camera-space normal (z toward viewer)
        n_cam = np.stack([-gx, gy, np.ones_like(gx) * 0.5], axis=-1)
        n_cam = n_cam / (np.linalg.norm(n_cam, axis=-1, keepdims=True) + 1e-9)
        n_world = n_cam @ c2w[:3, :3].T
        out.append(np.where(m[..., None] > 0, n_world, 0.0))
    return np.stack(out).astype(np.float32)


def load_dpt_normal_predictor(weights_path: Optional[str] = None
                              ) -> Optional[Callable]:
    """Returns predict(images (N,H,W,3) in [0,1]) -> normals (N,H,W,3) in
    camera space, or None when no converted DPT weights are available."""
    path = weights_path or os.environ.get("V3D_TPU_DPT_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    raise NotImplementedError(
        "DPT weight loading: convert the torch omnidata checkpoint with a "
        "converter analogous to core.convert (planned; blocked on weights "
        "being available in this environment)")
