"""Full sampling-loop parity vs the torch reference: same (small) UNet
weights, same noise, same schedule -> compare final latents.

This is the scaled-down version of the north-star check (per-frame PSNR vs
the PyTorch reference): reference EulerEDMSampler + Denoiser +
LinearPredictionGuider + VideoUNet against our scan-based engine path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import install_reference

torch = pytest.importorskip("torch")

T, H, W = 4, 16, 16
STEPS = 5
CFG_SCALE = 2.5


def _psnr(a, b, data_range):
    mse = np.mean((a - b) ** 2)
    return 20 * np.log10(data_range / np.sqrt(mse + 1e-12))


@pytest.mark.slow
def test_full_sampling_loop_parity():
    install_reference()
    from sgm.modules.diffusionmodules.denoiser import Denoiser as RefDenoiser
    from sgm.modules.diffusionmodules.video_model import VideoUNet as RefUNet

    cfg = dict(in_channels=8, model_channels=32, out_channels=4,
               num_res_blocks=1, attention_resolutions=[2, 1],
               channel_mult=[1, 2], num_head_channels=16, context_dim=64,
               adm_in_channels=32)
    ref_net = RefUNet(num_classes="sequential", use_linear_in_transformer=True,
                      extra_ff_mix_layer=True, use_spatial_context=True,
                      merge_strategy="learned_with_images",
                      video_kernel_size=[3, 1, 1],
                      spatial_transformer_attn_type="softmax", **cfg)
    g = torch.Generator().manual_seed(3)
    sd = ref_net.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.03
    ref_net.load_state_dict(sd)
    ref_net.eval()

    ref_denoiser = RefDenoiser({
        "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"})

    from sgm.modules.diffusionmodules.guiders import LinearPredictionGuider
    from sgm.modules.diffusionmodules.sampling import EulerEDMSampler

    sampler = EulerEDMSampler(
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 80.0}},
        guider_config={
            "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
            "params": {"max_scale": CFG_SCALE, "min_scale": 1.0,
                       "num_frames": T}},
        num_steps=STEPS, device="cpu")

    rs = np.random.RandomState(0)
    noise = rs.randn(T, 4, H, W).astype(np.float32)
    crossattn = rs.randn(1, 1, 64).astype(np.float32) * 0.3
    concat = rs.randn(1, 4, H, W).astype(np.float32) * 0.3
    vector = rs.randn(T, 32).astype(np.float32) * 0.3

    c = {"crossattn": torch.from_numpy(crossattn).repeat(T, 1, 1),
         "concat": torch.from_numpy(concat).repeat(T, 1, 1, 1),
         "vector": torch.from_numpy(vector)}
    uc = {"crossattn": torch.zeros_like(c["crossattn"]),
          "concat": torch.zeros_like(c["concat"]),
          "vector": torch.from_numpy(vector)}
    indicator = torch.zeros(2, T)

    def denoiser_fn(x, sigma, cond):
        return ref_denoiser(
            lambda xx, tt, cc, **kw: ref_net(
                torch.cat([xx, cc["concat"]], 1), tt,
                context=cc["crossattn"], y=cc["vector"],
                num_video_frames=T, image_only_indicator=indicator),
            x, sigma, cond)

    with torch.no_grad():
        z_ref = sampler(denoiser_fn, torch.from_numpy(noise).clone(),
                        cond=c, uc=uc).numpy()

    # ---- ours -----------------------------------------------------------
    from v3d_tpu.core.convert import convert_video_unet
    from v3d_tpu.diffusion.denoise import Denoiser
    from v3d_tpu.diffusion.discretize import EDMDiscretization
    from v3d_tpu.diffusion.guidance import LinearPredictionGuider as JGuider
    from v3d_tpu.diffusion.sampling import EulerEDMSampler as JSampler
    from v3d_tpu.diffusion.scaling import VScalingWithEDMcNoise
    from v3d_tpu.engines.wrappers import make_unet_network_fn
    from v3d_tpu.models.video_unet import VideoUNet

    jnet = VideoUNet(**{k: tuple(v) if isinstance(v, list) else v
                        for k, v in cfg.items()})
    params = {"params": convert_video_unet(ref_net.state_dict())}
    jc = {"crossattn": jnp.asarray(np.repeat(crossattn, T, 0)),
          "concat": jnp.asarray(np.repeat(concat, T, 0).transpose(0, 2, 3, 1)),
          "vector": jnp.asarray(vector)}
    juc = {"crossattn": jnp.zeros_like(jc["crossattn"]),
           "concat": jnp.zeros_like(jc["concat"]),
           "vector": jnp.asarray(vector)}
    jsampler = JSampler(
        discretization=EDMDiscretization(sigma_max=80.0), num_steps=STEPS,
        guider=JGuider(max_scale=CFG_SCALE, min_scale=1.0, num_frames=T))
    jdenoiser = Denoiser(scaling=VScalingWithEDMcNoise())
    network = make_unet_network_fn(jnet.apply, params, T)
    jind = jnp.zeros((2, T))

    def jdenoiser_fn(x, sigma, cond):
        return jdenoiser(network, x, sigma, cond,
                         image_only_indicator=jind)

    z = jsampler(jdenoiser_fn, jnp.asarray(noise.transpose(0, 2, 3, 1)),
                 jc, juc)
    z = np.asarray(z).transpose(0, 3, 1, 2)

    data_range = np.abs(z_ref).max()
    psnr = _psnr(z_ref, z, data_range)
    assert z.shape == z_ref.shape
    assert psnr > 40.0, f"sampling loop parity PSNR {psnr:.2f} < 40 dB"
