"""Parity of the fused Pallas GS tile compositor vs the XLA scan path.

Runs the Pallas kernel in interpreter mode on CPU (same recipe as
test_flash_attention).  The two compositors implement identical math
(gs/pallas_raster.py vs gs/render._composite_xla), so outputs must agree
to float tolerance, and the custom-VJP gradient (XLA recompute) must match
the XLA path's autodiff exactly.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.gaussians import from_pcd, random_init_pcd
from v3d_tpu.gs.render import RasterizeConfig, project_gaussians, rasterize


def _scene(n=600, res=64, seed=0):
    rng = np.random.RandomState(seed)
    xyz, colors = random_init_pcd(rng, n, radius=2.0)
    g = from_pcd(xyz, colors, sh_degree=0, capacity=n + 40)
    pose = get_uniform_poses(4, 2.0, 15.0, opengl=False)[1]
    cam = Camera.from_c2w(pose, 60.0, res, res)
    return g, cam


def _render(g, cam, cfg):
    proj = project_gaussians(g, cam)
    return rasterize(proj, cam.height, cam.width, jnp.ones(3), cfg)


@pytest.mark.parametrize("coarse", [False, True])
def test_pallas_forward_parity(coarse):
    g, cam = _scene()
    base = dict(max_per_tile=128, tile_chunk=8, coarse_factor=2,
                max_per_coarse=256, force_coarse=coarse)
    out_x = _render(g, cam, RasterizeConfig(backend="xla", **base))
    out_p = _render(g, cam, RasterizeConfig(backend="pallas",
                                            pallas_interpret=True, **base))
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.depth),
                               np.asarray(out_x.depth), atol=2e-4)


@pytest.mark.parametrize("bwd", ["xla", "pallas"])
def test_pallas_grad_parity(bwd):
    g, cam = _scene(n=300)
    base = dict(max_per_tile=128, tile_chunk=8, coarse_factor=2,
                max_per_coarse=256, force_coarse=True)

    def loss(params, backend, interp):
        cfg = RasterizeConfig(backend=backend, pallas_interpret=interp,
                              pallas_bwd=bwd, **base)
        gg = g._replace(**params)
        out = _render(gg, cam, cfg)
        # touch image, alpha AND depth so every cotangent row is exercised
        return (jnp.sum(out.image * jnp.cos(out.image))
                + 0.3 * jnp.sum(out.alpha ** 2)
                + 0.01 * jnp.sum(jnp.sin(out.depth)))

    params = {k: getattr(g, k) for k in
              ("xyz", "opacity", "scaling", "f_dc")}
    gx = jax.grad(lambda p: loss(p, "xla", False))(params)
    gp = jax.grad(lambda p: loss(p, "pallas", True))(params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gx[k]), rtol=2e-5, atol=2e-6,
            err_msg=f"grad mismatch for {k} (bwd={bwd})")


def test_pallas_early_exit_semantics():
    """A fully opaque near gaussian must occlude identically in both paths
    (exercises the T<1e-4 stop + early-exit chunk boundary)."""
    g, cam = _scene(n=600, seed=3)
    # crank opacity so transmittance saturates fast
    g = g._replace(opacity=jnp.full_like(g.opacity, 6.0))
    base = dict(max_per_tile=128, tile_chunk=8, coarse_factor=2,
                max_per_coarse=256, force_coarse=True)
    out_x = _render(g, cam, RasterizeConfig(backend="xla", **base))
    out_p = _render(g, cam, RasterizeConfig(backend="pallas",
                                            pallas_interpret=True, **base))
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=2e-5)
