"""Full-config parity: the REAL V3D_512 VideoUNet (320ch, mult [1,2,4,4],
ctx 1024, adm 768, head_dim 64 -> 5/10/20 heads) torch-vs-flax with random
weights through the converter.

Catches channel-scale-only bugs (GroupNorm group boundaries at 320/640/1280,
head-count splits, label_emb widths) that the tiny-config parity tests
(test_unet_parity.py SMALL=32ch) cannot exercise.  Spatial size is kept at
16x16 latents and t=2 frames so the 1.5B-param f32 forward fits a CPU slow
test; channel-dimension wiring does not depend on spatial extent.

Run with: python -m pytest tests/ -m slow -k full_config
"""

import gc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import install_reference

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

# scripts/pub/configs/V3D_512.yaml network_config (the real recipe)
V3D_512 = dict(
    in_channels=8,
    model_channels=320,
    out_channels=4,
    num_res_blocks=2,
    attention_resolutions=(4, 2, 1),
    channel_mult=(1, 2, 4, 4),
    num_head_channels=64,
    context_dim=1024,
    adm_in_channels=768,
)


def test_full_config_forward_parity():
    install_reference()
    from sgm.modules.diffusionmodules.video_model import VideoUNet as RefVideoUNet

    cfg = dict(V3D_512)
    cfg["attention_resolutions"] = list(cfg["attention_resolutions"])
    cfg["channel_mult"] = list(cfg["channel_mult"])
    ref = RefVideoUNet(
        num_classes="sequential",
        use_linear_in_transformer=True,
        extra_ff_mix_layer=True,
        use_spatial_context=True,
        merge_strategy="learned_with_images",
        video_kernel_size=[3, 1, 1],
        spatial_transformer_attn_type="softmax",
        use_checkpoint=False,
        **cfg,
    )
    g = torch.Generator().manual_seed(0)
    sd = ref.state_dict()
    for k in sd:
        # small scale keeps activations sane through 4 levels of random nets
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.02
    ref.load_state_dict(sd)
    ref.eval()

    t, h, w = 2, 16, 16
    rs = np.random.RandomState(0)
    x = rs.randn(t, 8, h, w).astype(np.float32)
    ts = rs.rand(t).astype(np.float32) + 0.3
    ctx = rs.randn(t, 1, 1024).astype(np.float32) * 0.3
    y = rs.randn(t, 768).astype(np.float32) * 0.3
    ind = np.zeros((1, t), np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), y=torch.from_numpy(y),
            num_video_frames=t, image_only_indicator=torch.from_numpy(ind),
        ).numpy()

    from v3d_tpu.core.convert import convert_video_unet
    from v3d_tpu.models.video_unet import VideoUNet

    params = {"params": convert_video_unet(ref.state_dict())}
    n_ref = sum(p.numel() for p in ref.parameters())
    n_jax = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    assert n_ref == n_jax
    assert n_ref > 1_400_000_000  # it really is the 1.5B config
    del ref, sd
    gc.collect()

    jnet = VideoUNet(**V3D_512)
    out_jax = jnet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts),
        jnp.asarray(ctx), jnp.asarray(y), num_video_frames=t,
        image_only_indicator=jnp.asarray(ind),
    )
    out_jax = np.asarray(out_jax).transpose(0, 3, 1, 2)

    assert out_ref.shape == out_jax.shape
    denom = np.abs(out_ref).mean() + 1e-8
    rel = np.abs(out_ref - out_jax).max() / denom
    assert rel < 2e-3, f"max rel deviation {rel}"
