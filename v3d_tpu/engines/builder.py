"""Engine construction from declarative configs.

Counterpart of the reference's instantiate_from_config wiring
(scripts/pub/V3D_512.py:72-112 + V3D_512.yaml); builds the
VideoDiffusionEngine with the V3D-512 recipe, or a scaled-down variant for
tests and dry runs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from v3d_tpu.diffusion.denoise import Denoiser
from v3d_tpu.diffusion.discretize import EDMDiscretization
from v3d_tpu.diffusion.guidance import LinearPredictionGuider, TrianglePredictionGuider
from v3d_tpu.diffusion.loss import StandardDiffusionLoss
from v3d_tpu.diffusion.sampling import EulerEDMSampler
from v3d_tpu.diffusion.scaling import VScalingWithEDMcNoise
from v3d_tpu.diffusion.sigma_sampling import EDMSampling
from v3d_tpu.diffusion.weighting import EDMWeighting
from v3d_tpu.engines.video_diffusion import VideoDiffusionEngine
from v3d_tpu.models.clip_vit import CLIPVisionTransformer
from v3d_tpu.models.vae import Encoder, VideoDecoder
from v3d_tpu.models.video_unet import VideoUNet


def build_v3d_engine(
    num_frames: int = 18,
    num_steps: int = 25,
    min_scale: float = 3.5,
    max_scale: float = 3.5,
    sigma_max: float = 700.0,
    guider: str = "linear",
    model_channels: int = 320,
    vae_ch: int = 128,
    resolution: int = 512,
    use_checkpoint: bool = False,
    dtype: Optional[jnp.dtype] = None,
    clip_cfg: Optional[Dict] = None,
    unet_overrides: Optional[Dict] = None,
) -> VideoDiffusionEngine:
    """The V3D_512.yaml recipe (scripts/pub/configs/V3D_512.yaml)."""
    guider_cls = {"linear": LinearPredictionGuider,
                  "triangle": TrianglePredictionGuider}[guider]
    sampler = EulerEDMSampler(
        discretization=EDMDiscretization(sigma_max=sigma_max),
        num_steps=num_steps,
        guider=guider_cls(max_scale=max_scale, min_scale=min_scale,
                          num_frames=num_frames),
    )
    unet_kw: Dict[str, Any] = dict(
        in_channels=8, model_channels=model_channels, out_channels=4,
        num_res_blocks=2, attention_resolutions=(4, 2, 1),
        channel_mult=(1, 2, 4, 4), num_head_channels=64, context_dim=1024,
        adm_in_channels=768, use_checkpoint=use_checkpoint, dtype=dtype,
    )
    unet_kw.update(unet_overrides or {})
    unet = VideoUNet(**unet_kw)

    vae_kw = dict(ch=vae_ch, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                  attn_resolutions=(), resolution=256, z_channels=4,
                  dtype=dtype)
    encoder = Encoder(double_z=True, **vae_kw)
    decoder_ctor = functools.partial(
        VideoDecoder, out_ch=3, video_kernel_size=(3, 1, 1), **vae_kw)

    def vae_decoder_ctor(t):
        return decoder_ctor(num_frames=t)

    clip = CLIPVisionTransformer(**(clip_cfg or {}), dtype=dtype)

    return VideoDiffusionEngine(
        unet=unet,
        denoiser=Denoiser(scaling=VScalingWithEDMcNoise()),
        sampler=sampler,
        vae_encoder=encoder,
        vae_decoder_ctor=vae_decoder_ctor,
        clip=clip,
        scale_factor=0.18215,
        num_frames=num_frames,
        loss_fn=StandardDiffusionLoss(
            sigma_sampler=EDMSampling(p_mean=1.5, p_std=2.0),
            loss_weighting=EDMWeighting(sigma_data=1.0),
        ),
    )


def build_tiny_engine(num_frames: int = 4, num_steps: int = 3,
                      resolution: int = 64, dtype=None) -> VideoDiffusionEngine:
    """Scaled-down engine (same topology) for tests / dry runs."""
    return build_v3d_engine(
        num_frames=num_frames, num_steps=num_steps, resolution=resolution,
        model_channels=32, vae_ch=32, dtype=dtype,
        unet_overrides=dict(num_res_blocks=1, attention_resolutions=(2, 1),
                            channel_mult=(1, 2), num_head_channels=16,
                            context_dim=64, adm_in_channels=768),
        clip_cfg=dict(width=64, layers=2, heads=4, patch_size=16,
                      image_size=224, output_dim=64),
    )


def init_engine_params(engine: VideoDiffusionEngine, rng: jax.Array,
                       height: int = 512, width: int = 512,
                       context_dim: Optional[int] = None) -> Dict:
    """Random-init all param trees (weights normally come from the converter)."""
    t = engine.num_frames
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    hl, wl = height // engine.downscale, width // engine.downscale
    ctx_dim = context_dim or engine.unet.context_dim
    unet_params = engine.unet.init(
        r1, jnp.zeros((t, hl, wl, 8)), jnp.zeros((t,)),
        jnp.zeros((t, 1, ctx_dim)), jnp.zeros((t, 768)),
        num_video_frames=t, image_only_indicator=jnp.zeros((1, t)))
    enc_params = engine.vae_encoder.init(r2, jnp.zeros((1, height, width, 3)))
    dec = engine.vae_decoder_ctor(t)
    dec_params = dec.init(r3, jnp.zeros((t, hl, wl, 4)))
    clip_params = engine.clip.init(
        r4, jnp.zeros((1, engine.clip.image_size, engine.clip.image_size, 3)))
    return {"unet": unet_params, "encoder": enc_params,
            "decoder": dec_params, "clip": clip_params}
