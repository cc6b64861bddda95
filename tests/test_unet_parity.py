"""Numeric parity: our flax VideoUNet vs the reference torch VideoUNet.

Builds both on a small config, randomizes the torch weights, converts them
with core.convert.convert_video_unet, and compares forward outputs.
This validates the architecture wiring AND the weight-layout conversion
(conv OIHW->HWIO, linear transpose, norm naming) in one shot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import install_reference

torch = pytest.importorskip("torch")

SMALL = dict(
    in_channels=8,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(2, 1),
    channel_mult=(1, 2),
    num_head_channels=16,
    context_dim=64,
    adm_in_channels=32,
)


def _build_ref(seed=0):
    install_reference()
    from sgm.modules.diffusionmodules.video_model import VideoUNet as RefVideoUNet

    cfg = dict(SMALL)
    cfg["attention_resolutions"] = list(cfg["attention_resolutions"])
    cfg["channel_mult"] = list(cfg["channel_mult"])
    net = RefVideoUNet(
        num_classes="sequential",
        use_linear_in_transformer=True,
        extra_ff_mix_layer=True,
        use_spatial_context=True,
        merge_strategy="learned_with_images",
        video_kernel_size=[3, 1, 1],
        spatial_transformer_attn_type="softmax",
        **cfg,
    )
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    net.load_state_dict(sd)
    net.eval()
    return net


def _build_jax():
    from v3d_tpu.models.video_unet import VideoUNet

    return VideoUNet(**SMALL)


@pytest.fixture(scope="module")
def parity_setup():
    ref = _build_ref()
    jnet = _build_jax()
    from v3d_tpu.core.convert import convert_video_unet

    params = {"params": convert_video_unet(ref.state_dict())}
    return ref, jnet, params


def test_param_count_matches(parity_setup):
    ref, jnet, params = parity_setup
    n_ref = sum(p.numel() for p in ref.parameters())
    n_jax = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    assert n_ref == n_jax


def test_forward_parity(parity_setup):
    ref, jnet, params = parity_setup
    t, h, w = 4, 16, 16
    rs = np.random.RandomState(0)
    x = rs.randn(t, 8, h, w).astype(np.float32)
    ts = rs.rand(t).astype(np.float32) + 0.3
    ctx = rs.randn(t, 1, 64).astype(np.float32) * 0.3
    y = rs.randn(t, 32).astype(np.float32) * 0.3
    ind = np.zeros((1, t), np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), y=torch.from_numpy(y),
            num_video_frames=t, image_only_indicator=torch.from_numpy(ind),
        ).numpy()

    # jit: one whole-graph compile is ~2x faster than per-op eager dispatch
    # on the CPU test box
    apply = jax.jit(lambda p, *a: jnet.apply(
        p, *a, num_video_frames=t, image_only_indicator=jnp.asarray(ind)))
    out_jax = apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y))
    out_jax = np.asarray(out_jax).transpose(0, 3, 1, 2)

    assert out_ref.shape == out_jax.shape
    denom = np.abs(out_ref).mean() + 1e-8
    rel = np.abs(out_ref - out_jax).max() / denom
    assert rel < 1e-3, f"max rel deviation {rel}"


def test_forward_parity_image_only(parity_setup):
    """image_only_indicator=1 must force spatial-only (alpha=1) blending."""
    ref, jnet, params = parity_setup
    t = 2
    rs = np.random.RandomState(1)
    x = rs.randn(t, 8, 8, 8).astype(np.float32)
    ts = np.full((t,), 0.7, np.float32)
    ctx = rs.randn(t, 1, 64).astype(np.float32) * 0.3
    y = rs.randn(t, 32).astype(np.float32) * 0.3
    ind = np.ones((1, t), np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x), torch.from_numpy(ts),
            context=torch.from_numpy(ctx), y=torch.from_numpy(y),
            num_video_frames=t, image_only_indicator=torch.from_numpy(ind),
        ).numpy()
    apply = jax.jit(lambda p, *a: jnet.apply(
        p, *a, num_video_frames=t, image_only_indicator=jnp.asarray(ind)))
    out_jax = np.asarray(apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(ts),
        jnp.asarray(ctx), jnp.asarray(y))).transpose(0, 3, 1, 2)
    denom = np.abs(out_ref).mean() + 1e-8
    assert np.abs(out_ref - out_jax).max() / denom < 1e-3
