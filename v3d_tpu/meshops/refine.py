"""Texture refinement (counterpart of mesh_recon/refine.py:135-288).

Optimizes per-vertex colors (through an inverse-sigmoid parameterization,
refine.py:184-185) so mesh renders match the generated orbit video frames:
loss = MSE (+ LPIPS when available), Adam lr 1e-3, views uniformly spaced
over the orbit."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from v3d_tpu.data.cameras import get_uniform_poses
from v3d_tpu.meshops.mesh import Mesh
from v3d_tpu.meshops.rasterize import (
    MeshRasterizer,
    perspective_from_fov,
    verts_to_clip,
)


@dataclasses.dataclass
class RefineConfig:
    iters: int = 500
    lr: float = 1e-3
    num_opt_views: int = 16
    fov_deg: float = 60.0
    radius: float = 2.0
    elevation: float = 0.0
    lambda_lpips: float = 0.0
    max_per_tile: int = 256
    tile_chunk: int = 16


class TextureRefiner:
    def __init__(self, mesh: Mesh, frames: np.ndarray,
                 config: RefineConfig = RefineConfig(), lpips_fn=None):
        """frames: (T, H, W, 3) in [0,1] (the generated orbit video)."""
        self.mesh = mesh
        self.cfg = config
        self.frames = frames
        self.lpips_fn = lpips_fn
        T, H, W = frames.shape[:3]
        self.raster = MeshRasterizer(H, W, config.max_per_tile,
                                     config.tile_chunk)
        poses = get_uniform_poses(T, config.radius, config.elevation,
                                  opengl=True)
        proj = perspective_from_fov(config.fov_deg, W / H)
        self.mvps = jnp.asarray(
            np.stack([proj @ np.linalg.inv(p) for p in poses]), jnp.float32)
        # optimize ``num_opt_views`` uniformly-spaced frames (refine.py:193)
        self.opt_views = jnp.asarray(
            np.linspace(0, T - 1, config.num_opt_views).astype(np.int32))
        init = mesh.vertex_colors if mesh.vertex_colors is not None else (
            np.full((mesh.vertices.shape[0], 3), 0.5, np.float32))
        init = np.clip(init, 1e-3, 1 - 1e-3)
        self.logits = jnp.asarray(np.log(init / (1 - init)), jnp.float32)
        self.verts = jnp.asarray(mesh.vertices)
        self.faces = jnp.asarray(mesh.faces)
        self.opt = optax.adam(config.lr)
        self.opt_state = self.opt.init(self.logits)
        self.targets = jnp.asarray(frames[self.opt_views], jnp.float32)
        self._step = jax.jit(self._train_step)

    def render(self, logits, view_idx):
        clip = verts_to_clip(self.verts, self.mvps[view_idx])
        colors = jax.nn.sigmoid(logits)
        out = self.raster(clip, self.faces, colors)
        # antialiased composite over white (dr.antialias on color+alpha,
        # mesh_recon/refine.py:115-168)
        img = out.attr * out.alpha[..., None] + (1.0 - out.alpha[..., None])
        return img, out.alpha

    def _train_step(self, logits, opt_state, view_slot):
        def loss_fn(logits):
            img, _ = self.render(logits, self.opt_views[view_slot])
            target = self.targets[view_slot]
            loss = jnp.mean((img - target) ** 2)
            if self.lpips_fn is not None and self.cfg.lambda_lpips > 0:
                loss = loss + self.cfg.lambda_lpips * self.lpips_fn(
                    img[None], target[None])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(logits)
        updates, opt_state = self.opt.update(grads, opt_state)
        return optax.apply_updates(logits, updates), opt_state, loss

    def run(self, iters: Optional[int] = None, seed: int = 0) -> List[float]:
        rs = np.random.RandomState(seed)
        losses = []
        for i in range(iters or self.cfg.iters):
            slot = int(rs.randint(len(self.opt_views)))
            self.logits, self.opt_state, loss = self._step(
                self.logits, self.opt_state, slot)
            losses.append(float(loss))
        return losses

    def export(self) -> Mesh:
        colors = np.asarray(jax.nn.sigmoid(self.logits))
        return Mesh(np.asarray(self.verts), np.asarray(self.faces),
                    vertex_colors=colors).auto_normal()
