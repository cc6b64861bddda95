"""Training-time noise-level samplers.

Counterpart of sgm/modules/diffusionmodules/sigma_sampling.py.  V3D trains
with ``EDMSampling(p_mean=1.5, p_std=2.0)`` (lognormal sigma).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from v3d_tpu.core.registry import register


@register("edm_sigma_sampling")
@dataclasses.dataclass(frozen=True)
class EDMSampling:
    p_mean: float = -1.2
    p_std: float = 1.2

    def __call__(self, rng: jax.Array, n_samples: int) -> jnp.ndarray:
        log_sigma = self.p_mean + self.p_std * jax.random.normal(rng, (n_samples,))
        return jnp.exp(log_sigma)


@register("discrete_sigma_sampling")
@dataclasses.dataclass(frozen=True)
class DiscreteSampling:
    """Uniform over a fixed discretization (sigma_sampling.py:16-30)."""

    discretization: object = None
    num_idx: int = 1000
    do_append_zero: bool = False
    flip: bool = True

    def __call__(self, rng: jax.Array, n_samples: int) -> jnp.ndarray:
        sigmas = jnp.asarray(
            self.discretization(self.num_idx, do_append_zero=self.do_append_zero, flip=self.flip)
        )
        idx = jax.random.randint(rng, (n_samples,), 0, self.num_idx)
        return sigmas[idx]
