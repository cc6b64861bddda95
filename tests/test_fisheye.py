"""Parity of the jax Fisheye624 camera model vs the torch.jit reference
(sgm/data/cam_utils.py:1036-1248)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

import ref_loader  # noqa: E402


def _load_cam_utils():
    """Import cam_utils by path: sgm.data.__init__ drags in torchdata."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_cam_utils", "/root/reference/sgm/data/cam_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rand_params(rng, b, n_params=16):
    p = np.zeros((b, n_params), np.float32)
    p[:, 0] = 300 + 50 * rng.rand(b)          # fx
    if n_params == 16:
        p[:, 1] = 300 + 50 * rng.rand(b)      # fy
        p[:, 2:4] = 250 + 10 * rng.randn(b, 2)
    else:
        p[:, 1:3] = 250 + 10 * rng.randn(b, 2)
    p[:, -12:-6] = 0.02 * rng.randn(b, 6)     # k0..k5
    p[:, -6:-4] = 0.01 * rng.randn(b, 2)      # p0, p1
    p[:, -4:] = 0.005 * rng.randn(b, 4)       # s0..s3
    return p


@pytest.mark.parametrize("n_params", [15, 16])
def test_fisheye624_project_parity(n_params):
    ref_loader.install_reference()
    cam_utils = _load_cam_utils()

    from v3d_tpu.data.fisheye import fisheye624_project

    rng = np.random.RandomState(0)
    b, n = 2, 64
    xyz = rng.randn(b, n, 3).astype(np.float32)
    xyz[..., 2] = 1.0 + np.abs(xyz[..., 2])  # in front of the camera
    params = _rand_params(rng, b, n_params)

    ref = cam_utils.fisheye624_project(
        torch.from_numpy(xyz), torch.from_numpy(params)).numpy()
    got = np.asarray(fisheye624_project(jnp.asarray(xyz),
                                        jnp.asarray(params)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_fisheye624_unproject_parity_and_roundtrip():
    ref_loader.install_reference()
    cam_utils = _load_cam_utils()

    from v3d_tpu.data.fisheye import (
        fisheye624_project,
        fisheye624_unproject_helper,
    )

    rng = np.random.RandomState(1)
    b, n = 2, 64
    params = _rand_params(rng, b, 16)
    uv = np.stack([
        250 + 120 * rng.randn(b, n),
        250 + 120 * rng.randn(b, n),
    ], -1).astype(np.float32)

    ref = cam_utils.fisheye624_unproject_helper(
        torch.from_numpy(uv), torch.from_numpy(params)).numpy()
    got = np.asarray(fisheye624_unproject_helper(jnp.asarray(uv),
                                                 jnp.asarray(params)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # unproject(project(X)) == X/z (reference-documented invariant; holds
    # within the FOV where 5 Newton iterations converge — the torch
    # original has the same fixed iteration budget)
    xyz = rng.randn(b, n, 3).astype(np.float32)
    xyz[..., :2] *= 0.6
    xyz[..., 2] = 1.5 + np.abs(xyz[..., 2])
    proj = fisheye624_project(jnp.asarray(xyz), jnp.asarray(params))
    rays = np.asarray(fisheye624_unproject_helper(proj, jnp.asarray(params)))
    np.testing.assert_allclose(rays, xyz / xyz[..., 2:3],
                               rtol=1e-3, atol=1e-3)
