"""SSIM parity: our banded-matmul formulation vs the reference's torch
window convs (recon/utils/loss_utils.py:49-90)."""

import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _load_ref_loss_utils():
    # loss_utils imports lpipsPyTorch at module top; stub it (we only need
    # the ssim window math)
    import types

    for name in ("lpipsPyTorch", "lpipsPyTorch.modules",
                 "lpipsPyTorch.modules.lpips"):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mod.lpips = lambda *a, **k: None
        mod.LPIPS = object
        sys.modules.setdefault(name, mod)
    spec = importlib.util.spec_from_file_location(
        "ref_loss_utils", "/root/reference/recon/utils/loss_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


import importlib.machinery  # noqa: E402


@pytest.mark.parametrize("hw", [(64, 64), (37, 53)])
def test_ssim_matches_reference(hw):
    ref_mod = _load_ref_loss_utils()
    from v3d_tpu.gs.losses import ssim

    rng = np.random.RandomState(0)
    h, w = hw
    a = rng.rand(h, w, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(h, w, 3).astype(np.float32), 0, 1)

    # reference expects (C, H, W)
    ref = float(ref_mod.ssim(
        torch.from_numpy(a.transpose(2, 0, 1)),
        torch.from_numpy(b.transpose(2, 0, 1))))
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref - ours) < 2e-5, (ref, ours)
