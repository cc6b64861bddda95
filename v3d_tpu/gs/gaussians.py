"""Gaussian point-cloud model as a pytree (counterpart of
recon/scene/gaussian_model.py:25-166).

Storage (pre-activation, as in the reference):
- xyz      (N, 3)
- f_dc     (N, 1, 3)   SH DC coefficients
- f_rest   (N, M, 3)   higher-order SH (M = (deg+1)^2 - 1)
- scaling  (N, 3)      log-scale
- rotation (N, 4)      unnormalized quaternion (w, x, y, z)
- opacity  (N, 1)      pre-sigmoid logit

TPU note: arrays are FIXED CAPACITY with an ``alive`` mask — densify/prune
(reference's optimizer-surgery, gaussian_model.py:375-567) rewrites slots
instead of reallocating, so jitted render/train steps never change shape.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from v3d_tpu.gs.sh import rgb2sh


class GaussianParams(NamedTuple):
    xyz: jnp.ndarray
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    alive: jnp.ndarray  # (N,) bool — dead slots are skipped by the rasterizer

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_degree(self) -> int:
        total = 1 + self.f_rest.shape[1]
        return int(np.sqrt(total)) - 1


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion (w,x,y,z) -> rotation matrix
    (recon/utils/general_utils.py build_rotation)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def get_scaling(g: GaussianParams) -> jnp.ndarray:
    return jnp.exp(g.scaling)


def get_opacity(g: GaussianParams) -> jnp.ndarray:
    op = jax.nn.sigmoid(g.opacity)
    return jnp.where(g.alive[:, None], op, 0.0)


def get_features(g: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([g.f_dc, g.f_rest], axis=1)


def build_covariance3d(g: GaussianParams, scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Sigma = R S S^T R^T (gaussian_model.py build_covariance_from_scaling_rotation)."""
    S = get_scaling(g) * scaling_modifier
    R = build_rotation(g.rotation)
    M = R * S[:, None, :]  # R @ diag(S)
    # f32 precision: default TPU matmul runs at bf16 (~0.4% rel err), which
    # perturbs the 2D conic enough to blur sub-pixel gaussian placement
    with jax.default_matmul_precision("float32"):
        return M @ M.transpose(0, 2, 1)


def from_pcd(points: np.ndarray, colors: np.ndarray, sh_degree: int = 0,
             capacity: Optional[int] = None) -> GaussianParams:
    """create_from_pcd (gaussian_model.py:127-166): SH DC from colors, scales
    from sqrt(mean squared 3-NN distance) (simple-knn distCUDA2 equivalent —
    here an exact chunked pairwise computation), identity rotations,
    opacity logit of 0.1."""
    n = points.shape[0]
    capacity = capacity or n
    assert capacity >= n
    m = (sh_degree + 1) ** 2 - 1

    dist2 = knn_mean_sq_dist(points, k=3)
    dist2 = np.maximum(dist2, 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return out

    rot = np.zeros((n, 4), np.float32)
    rot[:, 0] = 1.0
    g = GaussianParams(
        xyz=jnp.asarray(pad(points.astype(np.float32))),
        f_dc=jnp.asarray(pad(np.asarray(rgb2sh(colors.astype(np.float32)))[:, None, :])),
        f_rest=jnp.asarray(np.zeros((capacity, m, 3), np.float32)),
        scaling=jnp.asarray(pad(scales.astype(np.float32), fill=-10.0)),
        rotation=jnp.asarray(pad(rot, fill=0.0)).at[:, 0].set(1.0),
        opacity=jnp.asarray(pad(
            np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.1))), np.float32),
            fill=-10.0)),
        alive=jnp.asarray(np.arange(capacity) < n),
    )
    return g


def knn_mean_sq_dist(points: np.ndarray, k: int = 3,
                     chunk: int = 4096) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors (excluding self) —
    the simple-knn ``distCUDA2`` replacement (gaussian_model.py:20,142).

    Uses a KD-tree when scipy is present (0.3 s at the reference's 100k
    init points); the exact chunked pairwise path below is the fallback
    (minutes at 100k — it was the hidden cost of every trainer init at the
    reference operating point)."""
    try:
        from scipy.spatial import cKDTree

        d, _ = cKDTree(points).query(points, k=k + 1, workers=-1)
        return (d[:, 1:].astype(np.float32) ** 2).mean(1)
    except ImportError:
        pass
    n = points.shape[0]
    out = np.empty((n,), np.float32)
    pts = points.astype(np.float32)
    sq = (pts**2).sum(-1)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d2 = sq[s:e, None] + sq[None, :] - 2 * pts[s:e] @ pts.T
        np.fill_diagonal(d2[:, s:e], np.inf)
        d2 = np.maximum(d2, 0.0)
        part = np.partition(d2, k, axis=1)[:, :k]
        out[s:e] = part.mean(1)
    return out


def random_init_pcd(rng: np.random.RandomState, num_pts: int,
                    radius: float = 2.0) -> tuple:
    """VideoNVS random init (dataset_readers.py:485-489): xyz ~ N(0,1) *
    radius/16, uniform SH value 0.2 — i.e. RGB = SH2RGB(0.2) ~ 0.556 light
    gray.  (Round-2 fix: we used RGB 0.2 = dark gray, which on white-
    background fits drives a global opacity collapse in the first ~100
    iters — dark fog over a white scene is cheapest to remove by
    transparency.)"""
    from v3d_tpu.gs.sh import sh2rgb

    xyz = rng.randn(num_pts, 3).astype(np.float32) * radius / 16
    colors = np.full((num_pts, 3), float(sh2rgb(0.2)), np.float32)
    return xyz, colors
