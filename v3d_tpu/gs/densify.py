"""Densification / pruning for the fixed-capacity gaussian arrays.

Counterpart of recon/scene/gaussian_model.py:375-567 (densify_and_clone,
densify_and_split, densify_and_prune, reset_opacity, add_densification_stats
and the Adam optimizer-state surgery).  TPU adaptation: capacity is static;
clone/split write into dead slots and pruning just clears the ``alive`` mask,
so jitted train steps never recompile.  Runs on host numpy between jitted
optimization segments (it fires every ~100 iters — not a hot path).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

from v3d_tpu.gs.gaussians import GaussianParams


@dataclasses.dataclass
class DensifyState:
    """Accumulated screen-gradient statistics
    (gaussian_model.py:107-110,566-569)."""

    xyz_gradient_accum: np.ndarray  # (N,)
    denom: np.ndarray               # (N,)
    max_radii2d: np.ndarray         # (N,)

    @staticmethod
    def zeros(capacity: int) -> "DensifyState":
        return DensifyState(np.zeros(capacity, np.float32),
                            np.zeros(capacity, np.float32),
                            np.zeros(capacity, np.float32))

    def add_stats(self, screen_grad: np.ndarray, radii: np.ndarray,
                  visible: np.ndarray) -> None:
        norm = np.linalg.norm(screen_grad[:, :2], axis=-1)
        self.xyz_gradient_accum += np.where(visible, norm, 0.0)
        self.denom += visible.astype(np.float32)
        self.max_radii2d = np.maximum(self.max_radii2d,
                                      np.where(visible, radii, 0.0))


def _quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    w, x, y, z = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    n = np.sqrt(w**2 + x**2 + y**2 + z**2) + 1e-12
    w, x, y, z = w / n, x / n, y / n, z / n
    # rotation matrix rows applied to v
    vx, vy, vz = v[:, 0:1], v[:, 1:2], v[:, 2:3]
    rx = (1 - 2 * (y**2 + z**2)) * vx + 2 * (x * y - w * z) * vy + 2 * (x * z + w * y) * vz
    ry = 2 * (x * y + w * z) * vx + (1 - 2 * (x**2 + z**2)) * vy + 2 * (y * z - w * x) * vz
    rz = 2 * (x * z - w * y) * vx + 2 * (y * z + w * x) * vy + (1 - 2 * (x**2 + y**2)) * vz
    return np.concatenate([rx, ry, rz], axis=1)


def densify_and_prune(g_np: Dict[str, np.ndarray], state: DensifyState,
                      rng: np.random.RandomState,
                      max_grad: float = 0.0002,
                      min_opacity: float = 0.005,
                      extent: float = 2.0,
                      max_screen_size: float = 0.0,
                      percent_dense: float = 0.01,
                      n_split: int = 2) -> Tuple[Dict[str, np.ndarray], DensifyState, Dict]:
    """One densify+prune pass over numpy param dict (keys = GaussianParams
    fields).  Mirrors gaussian_model.py:477-563."""
    alive = g_np["alive"].copy()
    grads = np.where(state.denom > 0, state.xyz_gradient_accum / np.maximum(state.denom, 1), 0.0)
    scales = np.exp(g_np["scaling"])
    max_scale = scales.max(axis=1)
    opacity = 1.0 / (1.0 + np.exp(-g_np["opacity"][:, 0]))

    high_grad = (grads >= max_grad) & alive
    # clone: small gaussians (gaussian_model.py:521-546)
    clone_mask = high_grad & (max_scale <= percent_dense * extent)
    # split: large gaussians (gaussian_model.py:477-519)
    split_mask = high_grad & (max_scale > percent_dense * extent)

    free = np.nonzero(~alive)[0]
    stats = {"cloned": 0, "split": 0, "pruned": 0, "out_of_capacity": 0}

    def alloc(k):
        nonlocal free
        take = free[:k]
        free = free[k:]
        return take

    # clone: copy params verbatim
    clone_idx = np.nonzero(clone_mask)[0]
    take = alloc(len(clone_idx))
    src = clone_idx[:len(take)]
    stats["cloned"] = len(take)
    stats["out_of_capacity"] += len(clone_idx) - len(take)
    for k in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"):
        g_np[k][take] = g_np[k][src]
    alive[take] = True

    # split: sample n_split new points from the gaussian, shrink by 1.6,
    # original is pruned (reference creates N=2 and prunes the source)
    split_idx = np.nonzero(split_mask)[0]
    new_needed = len(split_idx) * n_split
    take = alloc(new_needed)
    stats["out_of_capacity"] += new_needed - len(take)
    src = np.repeat(split_idx, n_split)[:len(take)]
    stats["split"] = len(take)
    if len(take):
        std = np.exp(g_np["scaling"][src])
        samples = rng.randn(len(take), 3).astype(np.float32) * std
        offset = _quat_rotate(g_np["rotation"][src], samples)
        for k in ("f_dc", "f_rest", "opacity"):
            g_np[k][take] = g_np[k][src]
        g_np["rotation"][take] = g_np["rotation"][src]
        g_np["xyz"][take] = g_np["xyz"][src] + offset
        g_np["scaling"][take] = np.log(np.exp(g_np["scaling"][src]) / (0.8 * n_split))
        alive[take] = True
    alive[split_idx] = False  # prune split sources

    # prune: low opacity or huge screen/world size (gaussian_model.py:548-563)
    prune = (opacity < min_opacity) & alive
    if max_screen_size > 0:
        prune |= (state.max_radii2d > max_screen_size) & alive
        prune |= (max_scale > 0.1 * extent) & alive
    stats["pruned"] = int(prune.sum())
    alive &= ~prune

    g_np["alive"] = alive
    return g_np, DensifyState.zeros(len(alive)), stats


def reset_opacity(g_np: Dict[str, np.ndarray], max_opacity: float = 0.01) -> Dict:
    """gaussian_model.py:273-280: clamp opacity to at most ``max_opacity``."""
    op = 1.0 / (1.0 + np.exp(-g_np["opacity"]))
    op = np.minimum(op, max_opacity)
    g_np["opacity"] = np.log(op / (1 - op)).astype(np.float32)
    return g_np
