"""Declarative engine construction from YAML (the reference's
instantiate_from_config capability, sgm/util.py:170-187, over our registry).

    engine = engine_from_config(load_config("configs/v3d_512.yaml"))
"""

from __future__ import annotations

import functools
from typing import Mapping

import jax.numpy as jnp

from v3d_tpu.core.config import ConfigDict
from v3d_tpu.core.registry import instantiate
from v3d_tpu.engines.video_diffusion import VideoDiffusionEngine
from v3d_tpu.models.conditioner import EmbedderSpec, GeneralConditioner

# populate the registry
import v3d_tpu.diffusion  # noqa: F401
import v3d_tpu.diffusion.loss  # noqa: F401
import v3d_tpu.engines.lr_schedule  # noqa: F401
import v3d_tpu.models.clip_vit  # noqa: F401
import v3d_tpu.models.conditioner  # noqa: F401
import v3d_tpu.models.unet2d  # noqa: F401
import v3d_tpu.models.vae  # noqa: F401
import v3d_tpu.models.video_unet  # noqa: F401


def conditioner_from_config(emb_cfgs) -> GeneralConditioner:
    specs = []
    for cfg in emb_cfgs:
        emb = instantiate({"target": cfg["target"],
                           "params": cfg.get("params", {})})
        specs.append(EmbedderSpec(
            embed=emb, input_key=cfg["input_key"],
            ucg_rate=float(cfg.get("ucg_rate", 0.0)),
            is_trainable=bool(cfg.get("is_trainable", False))))
    return GeneralConditioner(embedders=tuple(specs))


def engine_from_config(cfg: Mapping, dtype=jnp.bfloat16) -> VideoDiffusionEngine:
    m = cfg["model"]
    unet = instantiate(m["network"], dtype=dtype)
    denoiser = instantiate(m["denoiser"])
    sampler = instantiate(m["sampler"])
    encoder = instantiate(m["first_stage"]["encoder"], dtype=dtype)
    dec_cfg = dict(m["first_stage"]["decoder"])
    dec_params = dict(dec_cfg.get("params", {}))

    def vae_decoder_ctor(t):
        return instantiate({"target": dec_cfg["target"],
                            "params": dict(dec_params, num_frames=t)},
                           dtype=dtype)

    loss_fn = instantiate(m["loss"]) if "loss" in m else None
    num_frames = int(m.get("num_frames", 18))

    from v3d_tpu.models.clip_vit import CLIPVisionTransformer

    engine = VideoDiffusionEngine(
        unet=unet, denoiser=denoiser, sampler=sampler, vae_encoder=encoder,
        vae_decoder_ctor=vae_decoder_ctor,
        clip=CLIPVisionTransformer(dtype=dtype),
        scale_factor=float(m.get("scale_factor", 0.18215)),
        num_frames=num_frames, loss_fn=loss_fn)
    # override the default conditioner when embedders are configured
    if "conditioner_embedders" in m:
        cond = conditioner_from_config(m["conditioner_embedders"])
        engine.conditioner = lambda: cond  # type: ignore[method-assign]
    return engine
