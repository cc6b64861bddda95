"""Tile-sharded GS rasterization on the 8-device CPU mesh: the sharded
compositor must match the single-device render, including gradients
(the multichip analog of recon/gaussian_renderer/__init__.py:22-134)."""

import numpy as np

import jax
import jax.numpy as jnp

from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.gaussians import GaussianParams, from_pcd, random_init_pcd
from v3d_tpu.gs.render import (RasterizeConfig, project_gaussians, rasterize,
                               rasterize_sharded)
from v3d_tpu.parallel.mesh import DATA_AXIS, make_mesh


def _setup(res=64, n=512):
    rng = np.random.RandomState(0)
    xyz, colors = random_init_pcd(rng, n, radius=1.2)
    g = from_pcd(xyz, colors, capacity=n)
    fp = GaussianParams(alive=jnp.asarray(g.alive), **{
        k: jnp.asarray(getattr(g, k))
        for k in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")})
    pose = get_uniform_poses(4, 2.0, 15.0, opengl=False)[1]
    cam = Camera.from_c2w(pose, 60.0, res, res)
    cfg = RasterizeConfig(max_per_tile=64, tile_chunk=4, coarse_factor=2,
                          max_per_coarse=256, force_coarse=True,
                          backend="xla")
    return fp, cam, cfg


def test_sharded_matches_single_device():
    fp, cam, cfg = _setup()
    mesh = make_mesh(model=1)
    bg = jnp.ones(3)
    proj = project_gaussians(fp, cam)
    ref = jax.jit(lambda p: rasterize(p, cam.height, cam.width, bg, cfg))(proj)
    with mesh:
        out = jax.jit(lambda p: rasterize_sharded(
            p, cam.height, cam.width, bg, mesh, DATA_AXIS, cfg))(proj)
    np.testing.assert_allclose(np.asarray(out.image), np.asarray(ref.image),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=2e-5)


def test_sharded_grads_match():
    fp, cam, cfg = _setup()
    mesh = make_mesh(model=1)
    bg = jnp.zeros(3)
    target = jnp.asarray(
        np.random.RandomState(1).rand(cam.height, cam.width, 3)
        .astype(np.float32))

    alive = fp.alive
    fields = ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity")
    fdict = {k: getattr(fp, k) for k in fields}

    def loss_single(fd):
        g = GaussianParams(alive=alive, **fd)
        out = rasterize(project_gaussians(g, cam), cam.height, cam.width,
                        bg, cfg)
        return jnp.mean(jnp.abs(out.image - target))

    def loss_sharded(fd):
        g = GaussianParams(alive=alive, **fd)
        out = rasterize_sharded(project_gaussians(g, cam), cam.height,
                                cam.width, bg, mesh, DATA_AXIS, cfg)
        return jnp.mean(jnp.abs(out.image - target))

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_single))(fdict)
    with mesh:
        l_sh, g_sh = jax.jit(jax.value_and_grad(loss_sharded))(fdict)
    assert abs(float(l_ref) - float(l_sh)) < 1e-6
    for k in ("xyz", "opacity", "scaling"):
        np.testing.assert_allclose(np.asarray(g_sh[k]), np.asarray(g_ref[k]),
                                   atol=1e-5,
                                   err_msg=f"grad mismatch on {k}")
