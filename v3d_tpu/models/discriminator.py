"""PatchGAN discriminator + adversarial losses for AE training (counterpart
of sgm/modules/autoencoding/losses/discriminator_loss.py
GeneralLPIPSWithDiscriminator :17)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.layers import conv_nd


class NLayerDiscriminator(nn.Module):
    """PatchGAN (pix2pix-style) used by the taming/sgm discriminator loss."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = conv_nd(self.ndf, (4, 4), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv_in")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for i in range(1, self.n_layers + 1):
            mult = min(2**i, 8)
            stride = (2, 2) if i < self.n_layers else (1, 1)
            h = conv_nd(self.ndf * mult, (4, 4), strides=stride,
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, self.ndf * mult),
                             param_dtype=jnp.float32)(h)
            h = nn.leaky_relu(h, 0.2)
        return conv_nd(1, (4, 4), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                       name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def generator_loss(logits_fake):
    return -jnp.mean(logits_fake)


def adaptive_weight(nll_grad_norm, g_grad_norm, max_w: float = 1e4):
    """discriminator_loss.py adaptive adversarial weight:
    ||grad nll|| / ||grad g||, clipped."""
    return jnp.clip(nll_grad_norm / (g_grad_norm + 1e-4), 0.0, max_w)
