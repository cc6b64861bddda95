"""Monocular normal supervision (counterpart of mesh_recon/utils/dpt.py —
the Omnidata DPT normal predictor — and the midas->blender->opencv->world
transforms of datasets/v3d.py:177-205).

The DPT architecture lives in ``models/dpt.py`` (flax port of the
vitb_rn50_384 hybrid, parity-tested vs the unmodified reference module);
``core.convert.convert_dpt`` maps the torch checkpoint.  The checkpoint
itself (omnidata_dpt_normal_v2.ckpt) is downloaded from HF by the reference;
this environment has no egress, so:
- ``load_dpt_normal_predictor`` builds the jitted predictor from a torch
  ckpt or a converted .npz when one is provided (V3D_TPU_DPT_WEIGHTS);
- ``dpt_world_normals`` implements the exact coordinate chain the reference
  applies to DPT outputs (datasets/v3d.py:173-205);
- ``normals_from_mask_distance`` is an EXPLICIT-OPT-IN fallback
  (--silhouette-normals): smooth silhouette-distance normals — far weaker
  than DPT but it exercises the full supervision path without weights.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def inv_RT(RT: np.ndarray) -> np.ndarray:
    """Invert a (3,4) or (4,4) pose; returns (3,4)
    (mesh_recon/datasets/ortho.py:81-85)."""
    RT_h = np.concatenate([RT[:3], np.array([[0, 0, 0, 1.0]])], axis=0)
    return np.linalg.inv(RT_h)[:3, :]


def dpt_world_normals(dpt_normals: np.ndarray, fg_masks: np.ndarray,
                      c2w_opengl: np.ndarray) -> np.ndarray:
    """The exact normal coordinate chain of mesh_recon/datasets/v3d.py:173-205
    applied to raw DPT outputs:

    [0,1] -> [-1,1]; midas->blender (negate all axes) then negate x back
    (net [1,-1,-1]); zero outside the fg mask; re-pack to [0,1]; per frame
    flip to OpenCV (normal_opengl2opencv on the PACKED values — faithfully
    reproducing the reference, which rotates packed values); rotate by the
    OpenCV c2w rotation (camNormal2worldNormal).

    dpt_normals: (T,H,W,3) in [0,1]; fg_masks: (T,H,W); c2w_opengl: (T,3,4)
    or (T,4,4) OpenGL c2w poses.  Returns (T,H,W,3) world 'normals' in the
    reference's packed convention — feed directly as NeuS supervision.
    """
    n = np.asarray(dpt_normals, np.float32) * 2.0 - 1.0
    # midas2blender (v3d.py:92-99) flips x,y,z; then v3d.py:180 flips x back
    n = n * np.array([1.0, -1.0, -1.0], np.float32)
    masks = np.asarray(fg_masks) > 0.1
    n = np.where(masks[..., None], n, 0.0)
    n = n * 0.5 + 0.5
    out = []
    for c2w_gl, ni in zip(c2w_opengl, n):
        RT_gl = inv_RT(c2w_gl)
        # RT_opengl2opencv (ortho.py:54-70): R_bcam2cv = diag(1,-1,-1)
        flip = np.array([1.0, -1.0, -1.0], np.float32)
        RT_cv = RT_gl * flip[:, None]
        # normal_opengl2opencv (ortho.py:72-80), applied to packed values
        ni_cv = ni * flip[None, None, :]
        R_c2w_cv = inv_RT(RT_cv)[:3, :3]
        out.append(ni_cv @ R_c2w_cv.T)
    return np.stack(out).astype(np.float32)


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


def load_dpt_normal_predictor(weights_path: Optional[str] = None,
                              infer_size: int = 384,
                              batch_size: int = 6) -> Optional[Callable]:
    """Returns predict(images (N,H,W,3) in [0,1]) -> normals (N,H,W,3) in
    [0,1] midas camera space (the reference wrapper's output,
    mesh_recon/utils/dpt.py:1036-1069), or None when no DPT weights are
    available.

    Accepts either the torch ``omnidata_dpt_normal_v2.ckpt`` (converted on
    the fly via core.convert.convert_dpt; requires torch importable) or an
    ``.npz`` of the already-converted flax params (flat '/'-joined keys, as
    written by ``save_dpt_params_npz``).
    """
    path = weights_path or os.environ.get("V3D_TPU_DPT_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None

    import jax
    import jax.numpy as jnp

    from v3d_tpu.models.dpt import DPT, dpt_normal_inference

    if path.endswith(".npz"):
        flat = np.load(path)
        params: dict = {}
        for key in flat.files:
            node = params
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = flat[key]
        params = {"params": params} if "params" not in params else params
    else:
        import torch

        from v3d_tpu.core.convert import convert_dpt
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        state = ckpt.get("state_dict", ckpt)
        params = convert_dpt(state)

    model = DPT(num_channels=3)
    apply = jax.jit(model.apply)

    def predict(images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32)
        out = []
        for i in range(0, images.shape[0], batch_size):
            chunk = jnp.asarray(images[i:i + batch_size])
            out.append(np.asarray(dpt_normal_inference(
                apply, params, chunk, infer_size=infer_size)))
        return np.concatenate(out, axis=0)

    return predict


def save_dpt_params_npz(params: dict, path: str) -> None:
    """Flatten a converted DPT param tree into an npz for egress-free use."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)
