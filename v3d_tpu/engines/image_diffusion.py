"""Image diffusion engine (counterpart of sgm/models/diffusion.py
DiffusionEngine + sgm/inference/helpers.py do_sample/do_img2img for the
image pipelines shipped alongside V3D).

Same diffusion math stack as the video engine, driving the 2D UNet; the
conditioner is any GeneralConditioner (text towers are out of scope per
SURVEY §7, but vector/crossattn/concat conditioning are fully supported).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from v3d_tpu.diffusion.denoise import Denoiser
from v3d_tpu.diffusion.discretize import SlicedDiscretization


@dataclasses.dataclass
class ImageDiffusionEngine:
    unet: Any
    denoiser: Denoiser
    sampler: Any
    vae_encoder: Any = None
    vae_decoder: Any = None
    scale_factor: float = 0.18215
    latent_channels: int = 4
    downscale: int = 8

    def _network(self, params):
        def network(x, c_noise, cond, **extra):
            inp = x
            if "concat" in cond:
                inp = jnp.concatenate([x, cond["concat"].astype(x.dtype)], -1)
            return self.unet.apply(params["unet"], inp, c_noise,
                                   context=cond.get("crossattn"),
                                   y=cond.get("vector"))

        return network

    def sample(self, params: Dict, rng: jax.Array, c: Dict, uc: Dict,
               batch: int = 1, height: int = 512, width: int = 512,
               noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """helpers.py do_sample: noise -> sampler -> latents."""
        shape = (batch, height // self.downscale, width // self.downscale,
                 self.latent_channels)
        rng_n, rng_s = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(rng_n, shape)
        network = self._network(params)

        def denoiser_fn(x, sigma, cond):
            return self.denoiser(network, x, sigma, cond)

        return self.sampler(denoiser_fn, noise, c, uc, rng=rng_s)

    def img2img(self, params: Dict, rng: jax.Array, init_latents: jnp.ndarray,
                c: Dict, uc: Dict, strength: float = 0.6) -> jnp.ndarray:
        """helpers.py do_img2img: partial schedule from a noised init."""
        n = self.sampler.num_steps
        run = max(1, int(round(n * strength)))
        sampler = dataclasses.replace(
            self.sampler, num_steps=run,
            discretization=SlicedDiscretization(
                base=self.sampler.discretization, skip=n - run))
        sigma0 = float(sampler.schedule()[0])
        rng_n, rng_s = jax.random.split(rng)
        noise = jax.random.normal(rng_n, init_latents.shape,
                                  init_latents.dtype)
        x = (init_latents + sigma0 * noise) / jnp.sqrt(1.0 + sigma0**2)
        network = self._network(params)

        def denoiser_fn(xx, sigma, cond):
            return self.denoiser(network, xx, sigma, cond)

        return sampler(denoiser_fn, x, c, uc, rng=rng_s)

    def decode(self, params: Dict, z: jnp.ndarray) -> jnp.ndarray:
        x = self.vae_decoder.apply(params["decoder"], z / self.scale_factor)
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

    def encode(self, params: Dict, images: jnp.ndarray,
               rng: jax.Array) -> jnp.ndarray:
        from v3d_tpu.models.vae import gaussian_sample

        moments = self.vae_encoder.apply(params["encoder"], images)
        return self.scale_factor * gaussian_sample(rng, moments)
