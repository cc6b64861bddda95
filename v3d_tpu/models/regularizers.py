"""Latent regularizers (counterpart of
sgm/modules/autoencoding/regularizers: DiagonalGaussianRegularizer :13 and
the quantize.py VQ family :64-487).

Functional: each regularizer maps encoder output -> (z, log dict); VQ uses
the straight-through estimator with codebook + commitment losses."""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from v3d_tpu.core.registry import register
from v3d_tpu.models.vae import gaussian_kl, gaussian_mode, gaussian_sample


@register("diagonal_gaussian_regularizer")
@dataclasses.dataclass(frozen=True)
class DiagonalGaussianRegularizer:
    sample: bool = True

    def __call__(self, moments: jnp.ndarray,
                 rng: jax.Array = None) -> Tuple[jnp.ndarray, Dict]:
        if self.sample:
            assert rng is not None
            z = gaussian_sample(rng, moments)
        else:
            z = gaussian_mode(moments)
        kl = jnp.mean(gaussian_kl(moments))
        return z, {"kl_loss": kl}


class VectorQuantizer:
    """quantize.py:64-200 core: nearest-codebook lookup with straight-through
    gradients.  Codebook is an explicit (n_e, e_dim) param array managed by
    the caller (pure function style)."""

    def __init__(self, n_e: int = 8192, e_dim: int = 4, beta: float = 0.25):
        self.n_e = n_e
        self.e_dim = e_dim
        self.beta = beta

    def init_codebook(self, rng: jax.Array) -> jnp.ndarray:
        return jax.random.uniform(rng, (self.n_e, self.e_dim),
                                  minval=-1.0 / self.n_e, maxval=1.0 / self.n_e)

    def __call__(self, codebook: jnp.ndarray,
                 z: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        """z: (..., e_dim) -> quantized with the same shape."""
        flat = z.reshape(-1, self.e_dim)
        d = (jnp.sum(flat**2, 1, keepdims=True)
             - 2 * flat @ codebook.T
             + jnp.sum(codebook**2, 1)[None, :])
        idx = jnp.argmin(d, axis=1)
        z_q = codebook[idx].reshape(z.shape)
        commit = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
        codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        loss = codebook_loss + self.beta * commit
        # straight-through estimator
        z_q = z + jax.lax.stop_gradient(z_q - z)
        # codebook usage perplexity
        onehot = jax.nn.one_hot(idx, self.n_e)
        probs = jnp.mean(onehot, axis=0)
        perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
        return z_q, {"vq_loss": loss, "perplexity": perplexity,
                     "indices": idx}
