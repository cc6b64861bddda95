"""Parity of the DPT (Omnidata normal) port vs the unmodified reference
mesh_recon/utils/dpt.py (run with a timm-compatible torch fixture backbone,
tests/torch_timm_hybrid.py), through the core.convert.convert_dpt weight
converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_timm_hybrid import load_reference_dpt_module  # noqa: E402


def test_dpt_forward_parity():
    ref_mod = load_reference_dpt_module()
    torch.manual_seed(0)
    ref = ref_mod.DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)
    ref.eval()

    from v3d_tpu.core.convert import convert_dpt
    from v3d_tpu.models.dpt import DPT

    params = convert_dpt(ref.state_dict())
    model = DPT(num_channels=3)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)

    with torch.no_grad():
        # DPTDepthModel.forward squeezes dim 1 only for num_channels=1;
        # with 3 channels the squeeze is a no-op: (B,3,H,W)
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    out = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x)))
    assert out.shape == ref_out.shape == (1, 128, 128, 3)
    err = np.abs(out - ref_out).max()
    scale = np.abs(ref_out).max() + 1e-8
    assert err / scale < 2e-4, (err, scale)


def test_resize_matmul_matches_torch():
    from v3d_tpu.models.dpt import (
        resize_bicubic,
        resize_bilinear,
        resize_bilinear_antialias,
    )

    rng = np.random.RandomState(0)
    x = rng.rand(2, 12, 12, 5).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    import torch.nn.functional as F

    # bilinear x2, align_corners=True (fusion upsample, dpt.py:893-897)
    ref = F.interpolate(xt, scale_factor=2, mode="bilinear",
                        align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (24, 24),
                                     align_corners=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # bilinear downsize, align_corners=False (pos-embed resize, dpt.py:137)
    ref = F.interpolate(xt, size=(5, 7), mode="bilinear",
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (5, 7),
                                     align_corners=False))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # bicubic upsample (final normals -> source res, dpt.py:1063-1066)
    ref = F.interpolate(xt, size=(30, 30), mode="bicubic",
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bicubic(jnp.asarray(x), (30, 30)))
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # antialiased bilinear downsample (torchvision Resize semantics)
    ref = F.interpolate(xt, size=(6, 6), mode="bilinear", antialias=True,
                        align_corners=False).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear_antialias(jnp.asarray(x), (6, 6)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.slow
def test_dpt_normal_predictor_roundtrip(tmp_path):
    """load_dpt_normal_predictor consumes both a torch ckpt and a converted
    npz, and reproduces the reference wrapper's output chain."""
    ref_mod = load_reference_dpt_module()
    torch.manual_seed(2)
    ref = ref_mod.DPTDepthModel(backbone="vitb_rn50_384", num_channels=3)
    ref.eval()

    ckpt_path = tmp_path / "omnidata_dpt_normal_v2.ckpt"
    torch.save({"state_dict": {"model." + k: v
                               for k, v in ref.state_dict().items()}},
               ckpt_path)

    from v3d_tpu.nerf.normals import load_dpt_normal_predictor

    predict = load_dpt_normal_predictor(str(ckpt_path), infer_size=128)
    assert predict is not None

    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 160, 160, 3).astype(np.float32)
    normals = predict(imgs)
    assert normals.shape == (2, 160, 160, 3)

    # reference wrapper chain at the same inference size:
    # resize(aa) -> model -> clamp -> bicubic back (dpt.py:1036-1069)
    import torch.nn.functional as F
    with torch.no_grad():
        xt = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        xt = F.interpolate(xt, size=(128, 128), mode="bilinear",
                           antialias=True, align_corners=False)
        n = ref(xt).clamp(0, 1)
        n = F.interpolate(n, size=(160, 160), mode="bicubic",
                          align_corners=False)
    ref_normals = n.numpy().transpose(0, 2, 3, 1)
    err = np.abs(normals - ref_normals).max()
    assert err < 5e-4, err
