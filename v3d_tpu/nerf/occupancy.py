"""Occupancy grid for ray-marching acceleration.

TPU-native replacement for nerfacc's ``OccupancyGrid``
(mesh_recon/models/neus.py:100-160): a dense res^3 float EMA of estimated
alpha plus a binary mask.  Updates run as a jitted evaluation of the
occ_eval_fn over (jittered) cell centers every ``update_interval`` steps;
lookups are simple voxel gathers inside the render step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class OccupancyGrid:
    radius: float = 1.0
    resolution: int = 128
    ema_decay: float = 0.95
    update_interval: int = 16
    occ_threshold: float = 0.001
    warmup_steps: int = 256

    def __post_init__(self):
        self.occs = jnp.zeros((self.resolution,) * 3, jnp.float32)
        self.binary = jnp.ones((self.resolution,) * 3, bool)  # start fully occupied

    def cell_centers(self, rng: jax.Array, jitter: bool = True) -> jnp.ndarray:
        r = self.resolution
        idx = jnp.stack(jnp.meshgrid(*([jnp.arange(r)] * 3), indexing="ij"),
                        axis=-1).reshape(-1, 3).astype(jnp.float32)
        offs = jax.random.uniform(rng, idx.shape) if jitter else 0.5
        pts01 = (idx + offs) / r
        return pts01 * 2 * self.radius - self.radius

    def update(self, step: int, occ_eval_fn: Callable, rng: jax.Array) -> None:
        """nerfacc every_n_step semantics: EMA of sampled occupancy, binary =
        occs > min(threshold, mean(occs))."""
        if step % self.update_interval != 0:
            return
        pts = self.cell_centers(rng, jitter=step >= self.warmup_steps)
        occ = occ_eval_fn(pts).reshape((self.resolution,) * 3)
        self.occs = jnp.maximum(self.occs * self.ema_decay, occ)
        thresh = jnp.minimum(self.occ_threshold, self.occs.mean())
        self.binary = self.occs > thresh

    def lookup(self, points: jnp.ndarray) -> jnp.ndarray:
        """Binary occupancy at world points (True = keep sample)."""
        return grid_lookup(self.binary, points, self.radius)


def grid_lookup(binary: jnp.ndarray, points: jnp.ndarray, radius: float) -> jnp.ndarray:
    r = binary.shape[0]
    x01 = (points + radius) / (2 * radius)
    idx = jnp.clip((x01 * r).astype(jnp.int32), 0, r - 1)
    inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
    return binary[idx[..., 0], idx[..., 1], idx[..., 2]] & inside
