"""Plain NeRF density field + renderer (counterpart of
mesh_recon/models/nerf.py and systems/nerf.py): hash encoding -> density
(trunc_exp) + color MLP, volume rendering with the same fixed-budget
marching as the NeuS renderer.  Used for the density-distillation path
(recon/convert_nerf_mesh.py fit_nerf) and as the learned-background field."""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.nerf.encoding import HashGrid, composite_with_xyz
from v3d_tpu.nerf.fields import VanillaMLP
from v3d_tpu.nerf.occupancy import grid_lookup
from v3d_tpu.nerf.renderer import ray_aabb_intersect


@jax.custom_jvp
def trunc_exp(x):
    """models/utils.py trunc_exp: exp with clamped gradient."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(x)
    return y, jnp.exp(jnp.clip(x, -15.0, 15.0)) * dx


class NerfField(nn.Module):
    """Density + color field (models/nerf.py VolumeDensity-style)."""

    radius: float = 1.0
    n_levels: int = 16
    base_resolution: int = 16
    per_level_scale: float = 1.447
    feature_dim: int = 16
    density_bias: float = -1.0

    def setup(self):
        self.encoding = HashGrid(self.n_levels, 2, 19, self.base_resolution,
                                 self.per_level_scale, name="encoding")
        self.sigma_net = VanillaMLP(1 + self.feature_dim, 64, 1,
                                    name="sigma_net")
        self.color_net = VanillaMLP(3, 64, 2, name="color_net")

    def density_feature(self, pts):
        x = jnp.clip((pts + self.radius) / (2 * self.radius), 0.0, 1.0)
        h = self.sigma_net(composite_with_xyz(x, self.encoding(x)))
        density = trunc_exp(h[..., 0] + self.density_bias)
        return density, h

    def __call__(self, pts, dirs):
        density, feat = self.density_feature(pts)
        rgb = jax.nn.sigmoid(self.color_net(
            jnp.concatenate([feat, dirs], axis=-1)))
        return density, rgb


class NerfRenderOut(NamedTuple):
    comp_rgb: jnp.ndarray
    opacity: jnp.ndarray
    depth: jnp.ndarray
    weights: jnp.ndarray
    midpoints: jnp.ndarray
    intervals: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class NerfRenderer:
    radius: float = 1.0
    num_samples: int = 512

    @property
    def step_size(self) -> float:
        return 1.732 * 2 * self.radius / self.num_samples

    def __call__(self, rays_o, rays_d, field_fn: Callable,
                 occupancy_binary: Optional[jnp.ndarray] = None,
                 background_color: Optional[jnp.ndarray] = None,
                 rng: Optional[jax.Array] = None) -> NerfRenderOut:
        R = rays_o.shape[0]
        S = self.num_samples
        t_near, t_far = ray_aabb_intersect(rays_o, rays_d, self.radius)
        s = jnp.arange(S, dtype=jnp.float32)
        jitter = (jax.random.uniform(rng, (R, S)) if rng is not None else 0.5)
        t_mid = t_near[:, None] + (s[None] + jitter) * self.step_size
        mask = (t_mid < t_far[:, None]) & (t_far > t_near)[:, None]
        pos = rays_o[:, None] + rays_d[:, None] * t_mid[..., None]
        if occupancy_binary is not None:
            mask = mask & grid_lookup(occupancy_binary, pos, self.radius)
        dirs = jnp.broadcast_to(rays_d[:, None], pos.shape)
        density, rgb = field_fn(pos.reshape(-1, 3), dirs.reshape(-1, 3))
        density = density.reshape(R, S)
        rgb = rgb.reshape(R, S, 3)
        alpha = 1.0 - jnp.exp(-density * self.step_size)
        alpha = jnp.where(mask, alpha, 0.0)
        t_excl = jnp.cumprod(
            jnp.concatenate([jnp.ones((R, 1)), 1 - alpha[:, :-1]], 1), 1)
        w = alpha * t_excl
        comp = jnp.sum(w[..., None] * rgb, 1)
        opac = jnp.sum(w, 1)
        depth = jnp.sum(w * t_mid, 1)
        if background_color is not None:
            comp = comp + (1 - opac)[:, None] * background_color[None]
        return NerfRenderOut(comp, opac, depth, w, t_mid,
                             jnp.full((R, S), self.step_size))
