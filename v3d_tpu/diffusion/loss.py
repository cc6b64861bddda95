"""Diffusion training loss (counterpart of
sgm/modules/diffusionmodules/loss.py:13-118 StandardDiffusionLoss).

Pure function: samples sigma (EDM lognormal for V3D), noises the latents,
runs the preconditioned denoiser, and returns the weighted per-sample loss.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from v3d_tpu.core.registry import register
from v3d_tpu.utils.misc import append_dims


@register("standard_diffusion_loss")
@dataclasses.dataclass(frozen=True)
class StandardDiffusionLoss:
    sigma_sampler: Callable = None
    loss_weighting: Callable = None
    loss_type: str = "l2"
    offset_noise_level: float = 0.0

    def __call__(self, network: Callable, denoiser: Callable, cond: Dict,
                 inputs: jnp.ndarray, rng: jax.Array,
                 extra_model_inputs: Optional[Dict] = None) -> jnp.ndarray:
        extra_model_inputs = extra_model_inputs or {}
        rng_sigma, rng_noise, rng_offset = jax.random.split(rng, 3)
        sigmas = self.sigma_sampler(rng_sigma, inputs.shape[0]).astype(inputs.dtype)
        noise = jax.random.normal(rng_noise, inputs.shape, inputs.dtype)
        if self.offset_noise_level > 0.0:
            offset = jax.random.normal(rng_offset, (inputs.shape[0],), inputs.dtype)
            noise = noise + self.offset_noise_level * append_dims(offset, inputs.ndim)
        sigmas_bc = append_dims(sigmas, inputs.ndim)
        noised = inputs + noise * sigmas_bc
        model_output = denoiser(network, noised, sigmas, cond, **extra_model_inputs)
        w = append_dims(self.loss_weighting(sigmas), inputs.ndim)
        if self.loss_type == "l2":
            per = (w * (model_output - inputs) ** 2)
        elif self.loss_type == "l1":
            per = (w * jnp.abs(model_output - inputs))
        else:
            raise NotImplementedError(self.loss_type)
        return jnp.mean(per.reshape(inputs.shape[0], -1), axis=1)


@register("diffusion_loss_with_pixelnerf")
@dataclasses.dataclass(frozen=True)
class StandardDiffusionLossWithPixelNeRFLoss(StandardDiffusionLoss):
    """loss.py:120-186: adds an L2 term between the PixelNeRF-rendered rgb
    (provided in cond["rgb"]) and the target views, weighted by
    ``pixelnerf_loss_weight``."""

    pixelnerf_loss_weight: float = 1.0

    def __call__(self, network, denoiser, cond, inputs, rng,
                 extra_model_inputs=None, rgb_target=None):
        base = StandardDiffusionLoss.__call__(
            self, network, denoiser,
            {k: v for k, v in cond.items() if k != "rgb"},
            inputs, rng, extra_model_inputs)
        if "rgb" in cond and rgb_target is not None:
            rgb_loss = jnp.mean(
                (cond["rgb"] - rgb_target) ** 2.0,
                axis=tuple(range(1, rgb_target.ndim)))
            base = base + self.pixelnerf_loss_weight * rgb_loss
        return base
