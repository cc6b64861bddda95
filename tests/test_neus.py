"""NeuS stack tests: hash encoding, sphere-init SDF, analytic-SDF renderer
checks, occupancy grid, and a short mask-supervised training run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
from v3d_tpu.nerf.encoding import (
    HashGrid,
    progressive_fd_eps,
    progressive_level_mask,
    spherical_harmonics_basis,
)
from v3d_tpu.nerf.fields import VanillaMLP, VarianceNetwork, VolumeSDF
from v3d_tpu.nerf.occupancy import OccupancyGrid, grid_lookup
from v3d_tpu.nerf.renderer import NeusRenderer, neus_alpha, ray_aabb_intersect
from v3d_tpu.nerf.system import NeusConfig, NeusTrainer, distortion_loss, ranking_loss


def test_hashgrid_shapes_and_interp():
    hg = HashGrid(n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
                  base_resolution=4, per_level_scale=1.5)
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 3))
    params = hg.init(jax.random.PRNGKey(1), x)
    out = hg.apply(params, x)
    assert out.shape == (16, 8)
    # continuity: nearby points give nearby features
    eps = 1e-4
    o1 = hg.apply(params, x)
    o2 = hg.apply(params, x + eps)
    assert float(jnp.abs(o1 - o2).max()) < 0.1
    # level mask zeroes features
    mask = jnp.asarray([1, 1, 0, 0, 0, 0, 0, 0], jnp.float32)
    o3 = hg.apply(params, x, mask)
    assert float(jnp.abs(o3[:, 2:]).max()) == 0.0


def test_progressive_schedules():
    m0 = progressive_level_mask(0, 10, 2, 4, 0, 1000)
    assert m0.sum() == 8
    m1 = progressive_level_mask(2000, 10, 2, 4, 0, 1000)
    assert m1.sum() == 12
    e0 = progressive_fd_eps(0, 1.0, 32, 1.3195, 4, 0, 1000, 10)
    e1 = progressive_fd_eps(2500, 1.0, 32, 1.3195, 4, 0, 1000, 10)
    assert e1 < e0


def test_sh_basis():
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    b = spherical_harmonics_basis(dirs, 4)
    assert b.shape == (1, 16)
    np.testing.assert_allclose(b[0, 0], 0.2820947917, rtol=1e-6)


def test_sphere_init_sdf():
    """Geometric init: raw SDF approximates |x| - 0.5."""
    geo = VolumeSDF(radius=1.0)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 0.6, 0.0]])
    params = geo.init(jax.random.PRNGKey(0), pts, eps=1e-3)
    sdf, grad, feat = geo.apply(params, pts, eps=1e-3)
    sdf = np.asarray(sdf)
    assert sdf[0] < 0, "origin should be inside the init sphere"
    assert sdf[1] > 0, "point at r=0.9 should be outside"
    # eikonal-ish at init: grad norms O(1)
    gn = np.linalg.norm(np.asarray(grad), axis=-1)
    assert np.all(gn > 0.05) and np.all(gn < 20)


def test_variance_network():
    v = VarianceNetwork(init_val=0.3)
    params = v.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(v.apply(params)), np.exp(3.0), rtol=1e-5)


def test_ray_aabb():
    o = jnp.asarray([[-2.0, 0, 0], [-2.0, 5.0, 0]])
    d = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]])
    tn, tf = ray_aabb_intersect(o, d, 1.0)
    np.testing.assert_allclose(tn[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(tf[0], 3.0, atol=1e-5)
    assert tn[1] > tf[1]  # miss


def test_renderer_analytic_sphere():
    """Analytic unit-sphere SDF: rays toward origin must saturate opacity and
    hit depth ~= distance - sphere radius."""
    r_sphere = 0.5
    renderer = NeusRenderer(radius=1.0, num_samples=128)

    def sdf_grad_feat(pts):
        norm = jnp.linalg.norm(pts, axis=-1)
        sdf = norm - r_sphere
        grad = pts / (norm[:, None] + 1e-9)
        feat = jnp.zeros(pts.shape[:-1] + (13,))
        return sdf, grad, feat

    def rgb_fn(feat, nrm):
        return jnp.ones(feat.shape[:-1] + (3,)) * 0.5

    rays_o = jnp.asarray([[-2.0, 0, 0], [-2.0, 0.9, 0.0]])
    rays_d = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]])
    out = renderer(rays_o, rays_d, sdf_grad_feat, rgb_fn,
                   inv_s=jnp.asarray(200.0), cos_anneal_ratio=1.0)
    op = np.asarray(out.opacity)
    assert op[0] > 0.95, f"center ray should be opaque, got {op[0]}"
    assert op[1] < 0.05, f"miss ray should be transparent, got {op[1]}"
    depth = float(out.depth[0] / max(op[0], 1e-6))
    assert abs(depth - 1.5) < 0.05
    # comp normal points back toward the camera (-x)
    n = np.asarray(out.comp_normal[0])
    assert n[0] < -0.9


def test_occupancy_grid_update_and_lookup():
    occ = OccupancyGrid(radius=1.0, resolution=16, update_interval=1)

    def occ_fn(pts):
        return (jnp.linalg.norm(pts, axis=-1) < 0.5).astype(jnp.float32)

    occ.update(0, occ_fn, jax.random.PRNGKey(0))
    inside = grid_lookup(occ.binary, jnp.asarray([[0.0, 0, 0]]), 1.0)
    outside = grid_lookup(occ.binary, jnp.asarray([[0.9, 0.9, 0.9]]), 1.0)
    assert bool(inside[0]) and not bool(outside[0])


def test_ranking_loss_trims():
    err = jnp.asarray([1.0, 2.0, 3.0, 100.0])
    full = ranking_loss(err, 1.0)
    trimmed = ranking_loss(err, 0.75)
    np.testing.assert_allclose(float(full), 26.5)
    np.testing.assert_allclose(float(trimmed), 2.0)


def test_distortion_loss_concentrated_vs_spread():
    m = jnp.linspace(0, 1, 16)[None]
    iv = jnp.full((1, 16), 1 / 16)
    w_concentrated = jnp.zeros((1, 16)).at[0, 8].set(1.0)
    w_spread = jnp.full((1, 16), 1 / 16)
    assert float(distortion_loss(w_concentrated, m, iv)) < float(
        distortion_loss(w_spread, m, iv))


@pytest.mark.slow
def test_neus_training_smoke():
    """Short mask-supervised run on a synthetic silhouette scene: loss drops
    and the carved opacity matches the mask."""
    res = 24
    n_views = 4
    poses = get_uniform_poses(n_views, 2.0, 0.0, opengl=True)
    focal = res / (2 * np.tan(np.deg2rad(30)))
    dirs = get_ray_directions(res, res, focal)
    # silhouette of a centered ball: white object on black bg
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 5) ** 2)
    images = np.repeat(mask[None, :, :, None], n_views, 0).astype(np.float32)
    images = np.tile(images, (1, 1, 1, 3)) * 0.8
    fg = np.repeat(mask[None], n_views, 0).astype(np.float32)

    cfg = NeusConfig(num_samples_per_ray=64, train_num_rays=128,
                     max_train_num_rays=128, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     cos_anneal_end=100, max_steps=60)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg, seed=0)
    losses = [trainer.train_iter()["loss"] for _ in range(60)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # SDF grid has negative (inside) values around origin region
    grid = trainer.sdf_grid(resolution=24)
    assert grid.min() < 0 < grid.max()


def test_frequency_encoding_geometry():
    """Gather-free geometry path: frequency encoding + analytic grads."""
    from v3d_tpu.nerf.encoding import VanillaFrequency

    enc = VanillaFrequency(n_frequencies=4, n_masking_step=100)
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 3))
    out = enc(x)
    assert out.shape == (8, 24)
    m0 = enc.mask(0)
    m_end = enc.mask(100)
    assert m0.sum() < m_end.sum() == 4.0

    geo = VolumeSDF(radius=1.0, encoding_type="frequency", n_frequencies=4,
                    grad_type="analytic", n_neurons=32, n_hidden_layers=2)
    pts = jnp.asarray([[0.0, 0, 0], [0.9, 0, 0]])
    params = geo.init(jax.random.PRNGKey(1), pts)
    sdf, grad, feat = geo.apply(params, pts)
    assert sdf.shape == (2,) and grad.shape == (2, 3)
    # sphere init holds for the frequency path too
    assert float(sdf[0]) < 0 < float(sdf[1])
    # analytic grads match finite differences of the same field
    eps = 1e-3
    offs = jnp.asarray([[eps, 0, 0], [0, eps, 0], [0, 0, eps]])
    for i in range(2):
        fd = [(geo.apply(params, pts[i:i+1] + o[None], with_grad=False)[0][0]
               - geo.apply(params, pts[i:i+1] - o[None], with_grad=False)[0][0])
              / (2 * eps) for o in offs]
        np.testing.assert_allclose(np.asarray(grad[i]), np.asarray(fd),
                                   rtol=1e-2, atol=1e-3)


@pytest.mark.slow
def test_neus_training_frequency_smoke():
    res, n_views = 20, 3
    poses = get_uniform_poses(n_views, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 5) ** 2)
    images = np.tile(mask[None, :, :, None], (n_views, 1, 1, 3)).astype(np.float32)
    fg = np.repeat(mask[None], n_views, 0).astype(np.float32)
    cfg = NeusConfig(num_samples_per_ray=48, train_num_rays=96,
                     max_train_num_rays=96, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     geometry_encoding="frequency", grad_type="analytic",
                     geo_neurons=64, geo_hidden_layers=2,
                     use_occ_lookup=False, max_steps=40)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg)
    losses = [trainer.train_iter()["loss"] for _ in range(40)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_ray_chunked_renderer_matches():
    renderer = NeusRenderer(radius=1.0, num_samples=32)
    chunked = NeusRenderer(radius=1.0, num_samples=32, ray_chunk=4)

    def sdf_grad_feat(pts):
        norm = jnp.sqrt(jnp.sum(pts**2, -1) + 1e-12)
        return norm - 0.5, pts / norm[:, None], jnp.zeros(pts.shape[:-1] + (13,))

    def rgb_fn(feat, nrm):
        return jnp.abs(nrm)

    rays_o = jnp.tile(jnp.asarray([[-2.0, 0, 0]]), (8, 1))
    rays_d = jnp.concatenate([
        jnp.tile(jnp.asarray([[1.0, 0, 0]]), (4, 1)),
        jnp.tile(jnp.asarray([[1.0, 0.3, 0.1]])
                 / np.linalg.norm([1, 0.3, 0.1]), (4, 1))])
    a = renderer(rays_o, rays_d, sdf_grad_feat, rgb_fn, jnp.asarray(100.0))
    b = chunked(rays_o, rays_d, sdf_grad_feat, rgb_fn, jnp.asarray(100.0))
    np.testing.assert_allclose(np.asarray(a.comp_rgb), np.asarray(b.comp_rgb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.opacity), np.asarray(b.opacity),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_ortho_neus_rays():
    """Wonder3D-style orthographic supervision (systems/neus_ortho.py):
    per-pixel ray origins, parallel directions."""
    from v3d_tpu.data.cameras import get_ortho_ray_directions

    res, n = 16, 2
    poses = get_uniform_poses(n, 2.0, 0.0, opengl=True)
    origins, dirs = get_ortho_ray_directions(res, res, scale=1.0)
    images = np.zeros((n, res, res, 3), np.float32)
    fg = np.ones((n, res, res), np.float32)
    cfg = NeusConfig(num_samples_per_ray=16, train_num_rays=32,
                     max_train_num_rays=32, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     geometry_encoding="frequency", grad_type="analytic",
                     geo_neurons=16, geo_hidden_layers=1,
                     use_occ_lookup=False, max_steps=5)
    tr = NeusTrainer(images, fg, dirs, poses, origins=origins, config=cfg)
    ro, rd, *_ = tr._sample_batch(jax.random.PRNGKey(0), 32)
    # parallel rays: all directions identical per camera; origins vary
    assert np.asarray(ro).std(0).max() > 0.01
    for _ in range(3):
        s = tr.train_iter()
        assert np.isfinite(s["loss"])


@pytest.mark.slow
def test_neus_train_chunk():
    """Chunked (lax.scan) training runs, consumes the per-step progressive
    schedules, and reduces the loss like the per-iter path."""
    res = 16
    n_views = 3
    poses = get_uniform_poses(n_views, 2.0, 0.0, opengl=True)
    focal = res / (2 * np.tan(np.deg2rad(30)))
    dirs = get_ray_directions(res, res, focal)
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 5) ** 2)
    images = np.tile(
        mask[None, :, :, None].astype(np.float32), (n_views, 1, 1, 3)) * 0.8
    fg = np.repeat(mask[None], n_views, 0).astype(np.float32)

    cfg = NeusConfig(num_samples_per_ray=16, train_num_rays=32,
                     max_train_num_rays=32, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     cos_anneal_end=10, max_steps=30,
                     geo_neurons=16, n_levels=4, n_frequencies=4,
                     # force per-step schedule variation inside one chunk
                     start_step=0, update_steps=4)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg, seed=0)
    first = trainer.train_chunk(6)
    assert trainer.global_step == 6
    stats = trainer.train(14, chunk=6)
    assert trainer.global_step == 20
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["loss"]) < float(first["loss"]) * 1.5


def test_analytic_fwd_grad_matches_analytic():
    """Forward-linearized SDF gradients == reverse-mode, and second-order
    (training) grads through them are finite."""
    pts = jnp.asarray(np.random.RandomState(0).uniform(
        -0.8, 0.8, (32, 3)).astype(np.float32))
    kw = dict(radius=1.0, encoding_type="frequency", n_frequencies=4,
              n_neurons=16, n_hidden_layers=1)
    g_an = VolumeSDF(grad_type="analytic", **kw)
    g_fw = VolumeSDF(grad_type="analytic_fwd", **kw)
    params = g_an.init(jax.random.PRNGKey(0), pts)
    _, gr1, _ = g_an.apply(params, pts)
    s2, gr2, _ = g_fw.apply(params, pts)
    np.testing.assert_allclose(np.asarray(gr1), np.asarray(gr2),
                               rtol=1e-5, atol=1e-6)

    def loss(p):
        s, gr, _ = g_fw.apply(p, pts)
        return jnp.mean((jnp.linalg.norm(gr, axis=-1) - 1) ** 2) + jnp.mean(s**2)

    gl = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(gl))


def test_contract_to_unisphere():
    """Inside the unit ball the contraction is affine; outside it lands in
    the [1,2) shell -> everything maps into [0,1]^3 (geometry.py:123)."""
    from v3d_tpu.nerf.fields import contract_to_unisphere

    pts = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [10.0, 0, 0],
                       [0, -1e4, 0], [3.0, 4.0, 0.0]])
    c = contract_to_unisphere(pts, radius=1.0)
    assert np.all((np.asarray(c) >= 0) & (np.asarray(c) <= 1))
    np.testing.assert_allclose(np.asarray(c[0]), [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c[1]), [0.625, 0.5, 0.5], atol=1e-6)
    # far points approach the shell boundary at 2/4 + 0.5 = 1.0
    assert float(c[2, 0]) > 0.97


def test_bg_renderer_constant_density():
    """Uniform density + constant color: opacity follows the analytic
    1 - exp(-sigma * (far - near)) and rgb composites toward the color."""
    from v3d_tpu.nerf.renderer import BgRenderer

    bg = BgRenderer(radius=1.0, num_samples=128, near_plane=0.1,
                    far_plane=50.0)
    rays_o = jnp.asarray([[0.0, 0, -3.0], [0.0, 0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0, 1.0], [0.0, 1.0, 0.0]])
    sigma = 0.1

    def density_fn(p):
        return jnp.full(p.shape[0], sigma), jnp.zeros((p.shape[0], 13))

    def rgb_fn(f, d):
        return jnp.full((f.shape[0], 3), 0.7)

    out = bg(rays_o, rays_d, density_fn, rgb_fn,
             background_color=jnp.zeros(3))
    # ray 0 exits the fg AABB at z=+1 -> t_start=4; marches 4 -> 50
    expected = 1.0 - np.exp(-sigma * (50.0 - 4.0))
    np.testing.assert_allclose(float(out.opacity[0]), expected, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(out.comp_rgb[0]),
                               0.7 * expected, rtol=2e-2)
    assert out.weights.shape == (2, 128)
    assert np.all(np.asarray(out.midpoints) > 0)


@pytest.mark.slow
def test_neus_learned_background_trains():
    """VERDICT item 8: a white-background scene trains with the bg field on
    (neus.py:193-270 forward_bg_ / out_full compositing)."""
    res, n_views = 20, 3
    poses = get_uniform_poses(n_views, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 5) ** 2)
    # dark object on WHITE background -> the bg field must learn white
    images = np.where(mask[None, :, :, None],
                      0.2, 1.0).astype(np.float32)
    images = np.tile(images, (1, 1, 1, 3))
    fg = np.repeat(mask[None], n_views, 0).astype(np.float32)
    cfg = NeusConfig(num_samples_per_ray=48, train_num_rays=96,
                     max_train_num_rays=96, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     geometry_encoding="frequency", grad_type="analytic",
                     geo_neurons=32, geo_hidden_layers=2,
                     use_occ_lookup=False, max_steps=50,
                     learned_background=True, num_samples_per_ray_bg=32,
                     lambda_distortion_bg=0.01)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg)
    assert "geometry_bg" in trainer.params and "texture_bg" in trainer.params
    losses = [trainer.train_iter()["loss"] for _ in range(50)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # full-frame validation render includes the bg compositing path
    rgb, opac, depth = trainer.render_image(np.asarray(poses[0]))
    assert rgb.shape == (res, res, 3) and np.isfinite(rgb).all()
    # background pixels (corners) should be brighter than the dark object
    assert rgb[0, 0].mean() > 0.4


def test_coarse_to_fine_matches_uniform():
    """Surface-guided coarse-to-fine sampling (the TPU empty-space skip,
    VERDICT r2 item 4): same opacity/depth as uniform sampling on the
    analytic sphere, with the fine budget concentrated near the surface."""
    r_sphere = 0.5

    def sdf_only(pts):
        return jnp.linalg.norm(pts, axis=-1) - r_sphere

    def sdf_grad_feat(pts):
        norm = jnp.linalg.norm(pts, axis=-1)
        return (norm - r_sphere, pts / (norm[:, None] + 1e-9),
                jnp.zeros(pts.shape[:-1] + (13,)))

    def rgb_fn(feat, nrm):
        return jnp.ones(feat.shape[:-1] + (3,)) * 0.5

    rays_o = jnp.asarray([[-2.0, 0, 0], [-2.0, 0.9, 0.0], [-2.0, 0.3, 0.1]])
    rays_d = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0], [1.0, 0, 0]])
    uniform = NeusRenderer(radius=1.0, num_samples=256)
    c2f = NeusRenderer(radius=1.0, num_samples=64, coarse_samples=32)
    a = uniform(rays_o, rays_d, sdf_grad_feat, rgb_fn,
                inv_s=jnp.asarray(200.0))
    b = c2f(rays_o, rays_d, sdf_grad_feat, rgb_fn,
            inv_s=jnp.asarray(200.0), sdf_fn=sdf_only)
    np.testing.assert_allclose(np.asarray(b.opacity), np.asarray(a.opacity),
                               atol=0.03)
    # hit-ray depths agree even though c2f uses 4x fewer samples
    for i in (0, 2):
        da = float(a.depth[i] / max(float(a.opacity[i]), 1e-6))
        db = float(b.depth[i] / max(float(b.opacity[i]), 1e-6))
        assert abs(da - db) < 0.03, (i, da, db)
    # the fine band actually tightened: ray 0's chord through the AABB is
    # 2.0 long, the sphere's crossing band (with margins) ~1.4 — the c2f
    # step must be well under the full-chord step chord/S
    band = float(b.intervals[0, 0]) * 64
    assert band < 0.8 * 2.0, band


def test_neus_training_coarse_to_fine_smoke():
    res, n_views = 20, 3
    poses = get_uniform_poses(n_views, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 5) ** 2)
    images = np.tile(mask[None, :, :, None], (n_views, 1, 1, 3)).astype(np.float32)
    fg = np.repeat(mask[None], n_views, 0).astype(np.float32)
    cfg = NeusConfig(num_samples_per_ray=32, train_num_rays=96,
                     max_train_num_rays=96, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     geometry_encoding="frequency", grad_type="analytic",
                     geo_neurons=32, geo_hidden_layers=2,
                     use_occ_lookup=False, max_steps=40,
                     coarse_to_fine_samples=16)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg)
    losses = [trainer.train_iter()["loss"] for _ in range(40)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_sdf_grid_matches_host_chunk_path():
    """NeusTrainer.sdf_grid (on-device grid generation, one jitted program)
    must equal evaluating the same host-built grid through geometry.apply —
    it feeds isosurface(grid_fn=...) in the recon CLIs."""
    import jax.numpy as jnp

    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    res = 8
    poses = get_uniform_poses(2, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    images = np.ones((2, res, res, 3), np.float32) * 0.5
    fg = np.ones((2, res, res), np.float32)
    cfg = NeusConfig(num_samples_per_ray=16, train_num_rays=32,
                     max_train_num_rays=32, dynamic_ray_sampling=False,
                     lambda_normal=0.0, max_steps=10)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg, seed=0)

    lo = np.array([-0.9, -1.0, -0.8], np.float32)
    hi = np.array([0.7, 1.0, 0.9], np.float32)
    n = 9
    got = trainer.sdf_grid(lo, hi, n)
    assert got.shape == (n, n, n)

    axes = [np.linspace(lo[i], hi[i], n, dtype=np.float32) for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    want = np.asarray(trainer.geometry.apply(
        trainer.params["geometry"], jnp.asarray(g), method="sdf",
        level_mask=trainer._level_mask())).reshape(n, n, n)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_isosurface_grid_fn_matches_sdf_fn():
    from v3d_tpu.meshops.mcubes import isosurface

    def sphere(p):
        return np.linalg.norm(p, axis=-1) - 0.5

    def grid_fn(lo, hi, res):
        axes = [np.linspace(lo[i], hi[i], res, dtype=np.float32)
                for i in range(3)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
        return sphere(g.reshape(-1, 3)).reshape(res, res, res)

    v1, f1 = isosurface(sphere, radius=1.0, resolution=24,
                        coarse_resolution=12)
    v2, f2 = isosurface(None, radius=1.0, resolution=24,
                        coarse_resolution=12, grid_fn=grid_fn)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_array_equal(f1, f2)


def test_vertex_colors_matches_eager_loop():
    """NeusTrainer.vertex_colors (one jitted padded-chunk program) must
    equal the eager per-chunk geometry/texture applies it replaced in the
    recon CLIs' mesh-export path."""
    import jax.numpy as jnp

    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    res = 8
    poses = get_uniform_poses(2, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    images = np.ones((2, res, res, 3), np.float32) * 0.5
    fg = np.ones((2, res, res), np.float32)
    cfg = NeusConfig(num_samples_per_ray=16, train_num_rays=32,
                     max_train_num_rays=32, dynamic_ray_sampling=False,
                     lambda_normal=0.0, max_steps=10)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg, seed=0)

    verts = np.random.RandomState(0).randn(101, 3).astype(np.float32) * 0.4
    got = trainer.vertex_colors(verts, chunk=64)  # exercises the padded tail

    level_mask = trainer._level_mask()
    sdf, grad, feat = trainer.geometry.apply(
        trainer.params["geometry"], jnp.asarray(verts),
        eps=trainer._fd_eps(), level_mask=level_mask)
    nrm = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-10)
    want = np.asarray(trainer.texture.apply(
        trainer.params["texture"], feat, nrm))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
