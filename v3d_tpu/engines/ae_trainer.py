"""Autoencoder training engine (counterpart of
sgm/models/autoencoder.py AutoencodingEngine training with
GeneralLPIPSWithDiscriminator — the manual two-optimizer loop).

Generator step: recon L1/L2 (+LPIPS when weights available) + KL (or VQ)
+ adversarial term after ``disc_start``.  Discriminator step: hinge loss on
real/reconstructed.  Both jitted; alternation on host."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from v3d_tpu.models.discriminator import (
    NLayerDiscriminator,
    generator_loss,
    hinge_d_loss,
)
from v3d_tpu.models.regularizers import DiagonalGaussianRegularizer
from v3d_tpu.models.vae import Decoder, Encoder, gaussian_kl, gaussian_sample


@dataclasses.dataclass
class AETrainConfig:
    lr: float = 4.5e-6
    disc_lr: float = 4.5e-6
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    disc_start: int = 50_000
    recon_loss: str = "l1"


class AutoencoderTrainer:
    def __init__(self, encoder: Encoder, decoder: Decoder,
                 config: AETrainConfig = AETrainConfig(),
                 lpips_fn=None, image_size: int = 256, seed: int = 0):
        self.cfg = config
        self.encoder = encoder
        self.decoder = decoder
        self.disc = NLayerDiscriminator()
        self.lpips_fn = lpips_fn
        rng = jax.random.PRNGKey(seed)
        r1, r2, r3, self.rng = jax.random.split(rng, 4)
        x = jnp.zeros((1, image_size, image_size, 3))
        enc_p = encoder.init(r1, x)
        z = jnp.zeros((1, image_size // 8, image_size // 8,
                       encoder.z_channels))
        dec_p = decoder.init(r2, z)
        self.params = {"encoder": enc_p, "decoder": dec_p}
        self.disc_params = self.disc.init(r3, x)
        self.opt = optax.adam(config.lr, b1=0.5, b2=0.9)
        self.opt_state = self.opt.init(self.params)
        self.d_opt = optax.adam(config.disc_lr, b1=0.5, b2=0.9)
        self.d_opt_state = self.d_opt.init(self.disc_params)
        self.step = 0
        self._g_step = jax.jit(self._gen_step)
        self._d_step = jax.jit(self._disc_step)

    def _recon(self, params, x, rng):
        moments = self.encoder.apply(params["encoder"], x)
        z = gaussian_sample(rng, moments)
        return self.decoder.apply(params["decoder"], z), moments

    def _gen_step(self, params, opt_state, disc_params, x, rng, use_disc):
        def loss_fn(params):
            recon, moments = self._recon(params, x, rng)
            if self.cfg.recon_loss == "l1":
                rec = jnp.mean(jnp.abs(recon - x))
            else:
                rec = jnp.mean((recon - x) ** 2)
            if self.lpips_fn is not None:
                rec = rec + self.lpips_fn((recon + 1) / 2, (x + 1) / 2)
            kl = jnp.mean(gaussian_kl(moments))
            g = generator_loss(self.disc.apply(disc_params, recon))
            total = (rec + self.cfg.kl_weight * kl
                     + use_disc * self.cfg.disc_weight * g)
            return total, {"rec": rec, "kl": kl, "g": g}

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, logs

    def _disc_step(self, disc_params, d_opt_state, params, x, rng):
        recon, _ = self._recon(params, x, rng)
        recon = jax.lax.stop_gradient(recon)

        def loss_fn(dp):
            lr_ = self.disc.apply(dp, x)
            lf = self.disc.apply(dp, recon)
            return hinge_d_loss(lr_, lf)

        loss, grads = jax.value_and_grad(loss_fn)(disc_params)
        updates, d_opt_state = self.d_opt.update(grads, d_opt_state)
        return optax.apply_updates(disc_params, updates), d_opt_state, loss

    def train_step(self, x: jnp.ndarray) -> Dict:
        self.rng, r1, r2 = jax.random.split(self.rng, 3)
        use_disc = jnp.asarray(
            1.0 if self.step >= self.cfg.disc_start else 0.0)
        self.params, self.opt_state, loss, logs = self._g_step(
            self.params, self.opt_state, self.disc_params, x, r1, use_disc)
        out = {"loss": float(loss),
               **{k: float(v) for k, v in logs.items()}}
        if self.step >= self.cfg.disc_start:
            self.disc_params, self.d_opt_state, d_loss = self._d_step(
                self.disc_params, self.d_opt_state, self.params, x, r2)
            out["d_loss"] = float(d_loss)
        self.step += 1
        return out
