"""Parity tests: flax VAE Encoder / Decoder / temporal VideoDecoder vs the
reference torch implementations (model.py, temporal_ae.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import install_reference

torch = pytest.importorskip("torch")

CFG = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
           resolution=32, z_channels=4)


def _rand_sd(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.08
    net.load_state_dict(sd)
    net.eval()
    return net


@pytest.fixture(scope="module")
def ref_modules():
    install_reference()
    from sgm.modules.diffusionmodules.model import Decoder as RefDecoder
    from sgm.modules.diffusionmodules.model import Encoder as RefEncoder
    from sgm.modules.autoencoding.temporal_ae import VideoDecoder as RefVideoDecoder

    kw = dict(ch=CFG["ch"], out_ch=3, ch_mult=list(CFG["ch_mult"]),
              num_res_blocks=CFG["num_res_blocks"], attn_resolutions=[],
              in_channels=3, resolution=CFG["resolution"],
              z_channels=CFG["z_channels"], attn_type="vanilla")
    enc = _rand_sd(RefEncoder(double_z=True, **kw), 0)
    dec = _rand_sd(RefDecoder(**kw), 1)
    vdec = _rand_sd(RefVideoDecoder(video_kernel_size=[3, 1, 1], **kw), 2)
    return enc, dec, vdec


def test_encoder_parity(ref_modules):
    enc, _, _ = ref_modules
    from v3d_tpu.core.convert import convert_vae
    from v3d_tpu.models.vae import Encoder

    jenc = Encoder(**CFG, double_z=True)
    params = {"params": convert_vae(enc.state_dict())}
    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    out = np.asarray(jenc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    out = out.transpose(0, 3, 1, 2)
    assert ref.shape == out.shape
    rel = np.abs(ref - out).max() / (np.abs(ref).mean() + 1e-8)
    assert rel < 1e-3, rel


def test_decoder_parity(ref_modules):
    _, dec, _ = ref_modules
    from v3d_tpu.core.convert import convert_vae
    from v3d_tpu.models.vae import Decoder

    jdec = Decoder(**CFG, out_ch=3)
    params = {"params": convert_vae(dec.state_dict())}
    z = np.random.RandomState(1).randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(z)).numpy()
    out = np.asarray(jdec.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1))))
    out = out.transpose(0, 3, 1, 2)
    rel = np.abs(ref - out).max() / (np.abs(ref).mean() + 1e-8)
    assert rel < 1e-3, rel


def test_video_decoder_parity(ref_modules):
    _, _, vdec = ref_modules
    from v3d_tpu.core.convert import convert_vae
    from v3d_tpu.models.vae import VideoDecoder

    t = 4
    jdec = VideoDecoder(**CFG, out_ch=3, num_frames=t,
                        video_kernel_size=(3, 1, 1))
    params = {"params": convert_vae(vdec.state_dict(), video_decoder=True)}
    z = np.random.RandomState(2).randn(t, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = vdec(torch.from_numpy(z), timesteps=t).numpy()
    out = np.asarray(jdec.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1))))
    out = out.transpose(0, 3, 1, 2)
    rel = np.abs(ref - out).max() / (np.abs(ref).mean() + 1e-8)
    assert rel < 1e-3, rel


def test_gaussian_regularizer():
    from v3d_tpu.models.vae import gaussian_kl, gaussian_mode, gaussian_sample

    moments = jnp.concatenate(
        [jnp.ones((2, 4, 4, 4)), jnp.zeros((2, 4, 4, 4))], axis=-1)
    mode = gaussian_mode(moments)
    np.testing.assert_allclose(mode, 1.0)
    s = gaussian_sample(jax.random.PRNGKey(0), moments)
    assert s.shape == (2, 4, 4, 4)
    kl = gaussian_kl(moments)
    np.testing.assert_allclose(kl, 0.5 * 64, rtol=1e-5)
