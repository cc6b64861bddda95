"""Declarative config -> engine construction."""

import jax.numpy as jnp

from v3d_tpu.core.config import load_config
from v3d_tpu.engines.from_config import engine_from_config


def test_v3d_512_config_builds():
    cfg = load_config("configs/v3d_512.yaml")
    engine = engine_from_config(cfg)
    assert engine.num_frames == 18
    assert engine.scale_factor == 0.18215
    assert engine.sampler.num_steps == 30
    assert engine.sampler.discretization.sigma_max == 700.0
    assert engine.sampler.guider.max_scale == 3.5
    assert engine.unet.model_channels == 320
    assert engine.unet.use_checkpoint
    assert engine.loss_fn.sigma_sampler.p_mean == 1.5
    cond = engine.conditioner()
    keys = [s.input_key for s in cond.embedders]
    assert keys == ["cond_frames_without_noise", "fps_id",
                    "motion_bucket_id", "cond_frames", "cond_aug"]
    assert cond.embedders[0].ucg_rate == 0.2
    dec = engine.vae_decoder_ctor(6)
    assert dec.num_frames == 6


def test_config_overrides_apply():
    cfg = load_config("configs/v3d_512.yaml",
                      overrides=["model.sampler.params.num_steps=25",
                                 "model.num_frames=8"])
    engine = engine_from_config(cfg)
    assert engine.sampler.num_steps == 25
    assert engine.num_frames == 8
