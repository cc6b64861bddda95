"""AE training stack: regularizers, discriminator, two-optimizer loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.models.discriminator import (
    NLayerDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
)
from v3d_tpu.models.regularizers import (
    DiagonalGaussianRegularizer,
    VectorQuantizer,
)


def test_gaussian_regularizer():
    reg = DiagonalGaussianRegularizer(sample=False)
    moments = jnp.concatenate([jnp.ones((2, 4, 4, 4)),
                               jnp.zeros((2, 4, 4, 4))], -1)
    z, log = reg(moments)
    np.testing.assert_allclose(z, 1.0)
    assert float(log["kl_loss"]) > 0


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_e=16, e_dim=4)
    codebook = vq.init_codebook(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 4)) * 0.01
    z_q, log = vq(codebook, z)
    assert z_q.shape == z.shape
    assert float(log["perplexity"]) >= 1.0
    # straight-through: dL/dz passes through
    g = jax.grad(lambda z: jnp.sum(vq(codebook, z)[0] ** 2))(z)
    assert float(jnp.abs(g).sum()) > 0
    # quantized values are codebook entries
    d = np.linalg.norm(np.asarray(z_q)[:, None] - np.asarray(codebook)[None],
                       axis=-1).min(1)
    np.testing.assert_allclose(d, 0, atol=1e-6)


def test_discriminator_and_losses():
    disc = NLayerDiscriminator(ndf=16, n_layers=2)
    x = jnp.zeros((2, 32, 32, 3))
    params = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(params, x)
    assert out.ndim == 4 and out.shape[-1] == 1
    lr_ = jnp.ones((2, 4, 4, 1))
    lf = -jnp.ones((2, 4, 4, 1))
    assert float(hinge_d_loss(lr_, lf)) == pytest.approx(0.0)
    assert float(vanilla_d_loss(lr_, lf)) > 0


@pytest.mark.slow
def test_ae_trainer_steps():
    from v3d_tpu.engines.ae_trainer import AETrainConfig, AutoencoderTrainer
    from v3d_tpu.models.vae import Decoder, Encoder

    kw = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
              resolution=32, z_channels=4)
    trainer = AutoencoderTrainer(
        Encoder(double_z=True, **kw), Decoder(out_ch=3, **kw),
        AETrainConfig(lr=1e-4, disc_start=2), image_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
    losses = [trainer.train_step(x)["loss"] for _ in range(4)]
    assert np.isfinite(losses).all()
    assert "d_loss" in trainer.train_step(x)
