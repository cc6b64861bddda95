"""Parity of the full-capacity PixelNeRF ResUNet image encoder vs the
unmodified reference sgm/modules/encoders/image_encoder.py:200-349, through
core.convert.convert_resunet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import ref_loader  # noqa: E402


def test_resunet_convert_shapes_and_forward_parity():
    """One pass: converted tree structure == fresh flax init, and forward
    activations match the torch reference bit-close."""
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
    x = rng.rand(2, 48, 48, 3).astype(np.float32)

    # structure: same paths, same shapes as a fresh init
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jnp.zeros_like(jnp.asarray(x[:1])))
    paths_c = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_leaves_with_path(params)}
    paths_i = {jax.tree_util.keystr(p): v.shape for p, v in
               jax.tree_util.tree_leaves_with_path(init)}
    assert paths_c == paths_i

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    assert out.shape == ref_out.shape == (2, 12, 12, 64)
    err = np.abs(out - ref_out).max()
    scale = np.abs(ref_out).max() + 1e-8
    assert err / scale < 2e-4, (err, scale)


def test_pixelnerf_with_resunet_encoder():
    """PixelNeRF conditioner runs with the full-capacity encoder selected."""
    from v3d_tpu.models.pixelnerf import PixelNeRF

    model = PixelNeRF(num_samples=4, feat_dim=16, out_feature_dim=2,
                      encoder_type="resunet")
    H = W = 32
    src = jnp.zeros((H, W, 3))
    w2c = jnp.eye(4)
    K = jnp.asarray([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]])
    c2ws = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    Ks = jnp.tile(K[None], (2, 1, 1))
    # shape-only init: actually materializing resnet34's random init takes
    # ~100s on CPU (28 threefry programs); deterministic small values are
    # enough to smoke the wiring
    shapes = jax.eval_shape(
        lambda r: model.init(r, src, w2c, K, c2ws, Ks, (8, 8)),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
    rgb, feats = jax.jit(
        lambda p, s: model.apply(p, s, w2c, K, c2ws, Ks, (8, 8)))(params, src)
    assert rgb.shape == (2, 8, 8, 3) and feats.shape == (2, 8, 8, 2)
    assert np.isfinite(np.asarray(rgb)).all()
