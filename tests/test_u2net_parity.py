"""Parity of the flax U2Net port (rembg's background-removal model) vs a
faithful torch restatement of xuebinqin/U-2-Net, through the
``convert_u2net`` weight converter.  The reference consumes this model via
rembg at scripts/pub/V3D_512.py:210 and mesh_recon/datasets/v3d.py:159-161.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_u2net import U2NET  # noqa: E402

from v3d_tpu.core.convert import convert_u2net
from v3d_tpu.models.u2net import U2Net, load_u2net, u2net_matte


def _rand_bn_stats(ref):
    """Random (non-default) BN running stats so the converter's handling of
    them is actually exercised."""
    g = torch.Generator().manual_seed(7)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


@pytest.mark.parametrize("small", [True, False])
def test_u2net_forward_parity(small):
    torch.manual_seed(0)
    ref = U2NET(small=small)
    with torch.no_grad():
        _rand_bn_stats(ref)
    ref.eval()

    params = convert_u2net(ref.state_dict())
    model = U2Net(small=small)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    outs = jax.jit(model.apply)(params, jnp.asarray(x))
    assert len(outs) == 7
    for o, r in zip(outs, ref_outs):
        rn = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == rn.shape
        np.testing.assert_allclose(np.asarray(o), rn, atol=2e-5)


@pytest.mark.slow
def test_u2net_odd_size_ceil_pooling():
    """ceil_mode pooling: odd spatial sizes must round-trip without shape
    errors and match torch."""
    torch.manual_seed(2)
    ref = U2NET(small=True)
    ref.eval()
    params = convert_u2net(ref.state_dict())
    model = U2Net(small=True)
    rng = np.random.RandomState(3)
    x = rng.rand(1, 70, 70, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
    out = model.apply(params, jnp.asarray(x))[0]
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_u2net_matte_protocol():
    """The rembg protocol produces a full RGBA image at input size with a
    min-max-normalized alpha."""
    torch.manual_seed(4)
    ref = U2NET(small=True)
    ref.eval()
    params = convert_u2net(ref.state_dict())
    model = U2Net(small=True)
    apply_fn = jax.jit(model.apply)
    rng = np.random.RandomState(5)
    img = (rng.rand(97, 83, 3) * 255).astype(np.uint8)
    rgba = u2net_matte(apply_fn, params, img, infer_size=64)
    assert rgba.shape == (97, 83, 4) and rgba.dtype == np.uint8
    np.testing.assert_array_equal(rgba[..., :3], img)
    # min-max normalization happens at inference size; after resize back the
    # alpha still spans (nearly) the full range
    assert rgba[..., 3].min() < 50 and rgba[..., 3].max() > 200


def test_load_u2net_gates_cleanly(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("V3D_U2NET_CKPT", raising=False)
    assert load_u2net() is None

    # with a real torch checkpoint on disk the loader returns a callable
    torch.manual_seed(6)
    ref = U2NET(small=True)
    (tmp_path / "ckpts").mkdir()
    torch.save(ref.state_dict(), tmp_path / "ckpts" / "u2netp.pth")
    fn = load_u2net()
    assert fn is not None and getattr(fn, "kind", "") == "u2net"
    rgba = fn((np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8))
    assert rgba.shape == (40, 40, 4)
