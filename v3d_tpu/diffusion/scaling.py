"""EDM denoiser preconditioning scalings.

TPU-native re-implementation of the scaling family in the reference's
sgm/modules/diffusionmodules/denoiser_scaling.py:15-59.  Each scaling maps a
noise level ``sigma`` to the four preconditioning coefficients
``(c_skip, c_out, c_in, c_noise)`` of Karras et al. (EDM).  V3D uses
``VScalingWithEDMcNoise`` (V scaling with the EDM 0.25*log(sigma) time input).

All scalings are pure functions of jnp arrays and safe to call inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from v3d_tpu.core.registry import register

Coeffs = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


@register("edm_scaling")
@dataclasses.dataclass(frozen=True)
class EDMScaling:
    sigma_data: float = 0.5

    def __call__(self, sigma: jnp.ndarray) -> Coeffs:
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


@register("eps_scaling")
@dataclasses.dataclass(frozen=True)
class EpsScaling:
    def __call__(self, sigma: jnp.ndarray) -> Coeffs:
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


@register("v_scaling")
@dataclasses.dataclass(frozen=True)
class VScaling:
    def __call__(self, sigma: jnp.ndarray) -> Coeffs:
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


@register("v_scaling_edm_cnoise")
@dataclasses.dataclass(frozen=True)
class VScalingWithEDMcNoise:
    """V3D's scaling (denoiser_scaling.py:51-59): V-scaling coefficients with
    the EDM ``c_noise = 0.25 * log(sigma)`` network time conditioning."""

    def __call__(self, sigma: jnp.ndarray) -> Coeffs:
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise
