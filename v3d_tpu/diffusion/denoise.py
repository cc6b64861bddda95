"""EDM-preconditioned denoiser.

Counterpart of sgm/modules/diffusionmodules/denoiser.py:11-75: the denoiser
wraps the raw network with Karras preconditioning,

    D(x, sigma) = network(x * c_in, c_noise, cond) * c_out + x * c_skip.

``network`` here is any callable ``(x, c_noise, cond, **extra) -> out`` — in
practice the bound apply function of the VideoUNet wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from v3d_tpu.core.registry import register
from v3d_tpu.utils.misc import append_dims


@register("denoiser")
@dataclasses.dataclass(frozen=True)
class Denoiser:
    scaling: Callable

    def quantize_sigma(self, sigma):
        return sigma

    def quantize_c_noise(self, c_noise):
        return c_noise

    def __call__(self, network: Callable, x: jnp.ndarray, sigma: jnp.ndarray,
                 cond: Dict, **extra) -> jnp.ndarray:
        sigma = self.quantize_sigma(sigma)
        sigma_shape = sigma.shape
        sigma_b = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_b)
        c_noise = self.quantize_c_noise(c_noise.reshape(sigma_shape))
        model_out = network(x * c_in, c_noise, cond, **extra)
        return model_out * c_out + x * c_skip


@register("discrete_denoiser")
@dataclasses.dataclass(frozen=True)
class DiscreteDenoiser(Denoiser):
    """Quantizes sigma to the nearest entry of a fixed discretization and
    (optionally) feeds the *index* as c_noise (denoiser.py:42-75)."""

    discretization: object = None
    num_idx: int = 1000
    do_append_zero: bool = False
    quantize_c_noise_flag: bool = True
    flip: bool = True

    @property
    def sigmas(self) -> jnp.ndarray:
        return jnp.asarray(
            self.discretization(self.num_idx, do_append_zero=self.do_append_zero, flip=self.flip)
        )

    def sigma_to_idx(self, sigma: jnp.ndarray) -> jnp.ndarray:
        dists = sigma[None, :] - self.sigmas[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def quantize_sigma(self, sigma):
        return self.sigmas[self.sigma_to_idx(sigma)]

    def quantize_c_noise(self, c_noise):
        if self.quantize_c_noise_flag:
            return self.sigma_to_idx(c_noise)
        return c_noise
