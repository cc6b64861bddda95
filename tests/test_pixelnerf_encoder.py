"""Parity of the full-capacity PixelNeRF ResUNet image encoder vs the
unmodified reference sgm/modules/encoders/image_encoder.py:200-349, through
core.convert.convert_resunet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import ref_loader  # noqa: E402


def test_resunet_forward_parity():
    ref_loader.install_reference()
    from sgm.modules.encoders.image_encoder import ResUNet as TorchResUNet

    torch.manual_seed(0)
    ref = TorchResUNet(encoder="resnet34", coarse_out_ch=32, fine_out_ch=32)
    ref.eval()

    from v3d_tpu.core.convert import convert_resunet
    from v3d_tpu.models.pixelnerf_encoder import ResUNet

    params = convert_resunet(ref.state_dict())
    model = ResUNet(coarse_out_ch=32, fine_out_ch=32)

    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    assert out.shape == ref_out.shape == (2, 16, 16, 64)
    err = np.abs(out - ref_out).max()
    scale = np.abs(ref_out).max() + 1e-8
    assert err / scale < 2e-4, (err, scale)


def test_resunet_init_shapes_match_converter():
    """A fresh flax init produces exactly the converted tree structure."""
    ref_loader.install_reference()
    from sgm.modules.encoders.image_encoder import ResUNet as TorchResUNet

    torch.manual_seed(0)
    ref = TorchResUNet(encoder="resnet34")
    from v3d_tpu.core.convert import convert_resunet
    from v3d_tpu.models.pixelnerf_encoder import ResUNet

    conv = convert_resunet(ref.state_dict())
    model = ResUNet()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    flat_c = jax.tree_util.tree_leaves_with_path(conv)
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in flat_c}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_i}
    assert paths_c == paths_i


def test_pixelnerf_with_resunet_encoder():
    """PixelNeRF conditioner runs with the full-capacity encoder selected."""
    import jax.numpy as jnp

    from v3d_tpu.models.pixelnerf import PixelNeRF

    model = PixelNeRF(num_samples=4, feat_dim=16, out_feature_dim=2,
                      encoder_type="resunet")
    H = W = 32
    src = jnp.zeros((H, W, 3))
    w2c = jnp.eye(4)
    K = jnp.asarray([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]])
    c2ws = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    Ks = jnp.tile(K[None], (2, 1, 1))
    params = model.init(jax.random.PRNGKey(0), src, w2c, K, c2ws, Ks, (8, 8))
    rgb, feats = model.apply(params, src, w2c, K, c2ws, Ks, (8, 8))
    assert rgb.shape == (2, 8, 8, 3) and feats.shape == (2, 8, 8, 2)
    assert np.isfinite(np.asarray(rgb)).all()
