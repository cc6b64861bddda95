"""3DGS fitting smoke test: optimize a tiny scene toward synthetic targets
and check the loss drops and densify/prune machinery runs."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.data.cameras import orbit_cameras
from v3d_tpu.gs.gaussians import GaussianParams, inverse_sigmoid
from v3d_tpu.gs.ply import load_ply, save_ply
from v3d_tpu.gs.render import RasterizeConfig, render
from v3d_tpu.gs.sh import rgb2sh
from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer


def _target_scene(res=32, n_views=4):
    """Ground-truth: 3 colored gaussians around the origin."""
    xyz = np.array([[0.0, 0, 0], [0.35, 0, 0.1], [-0.2, 0.25, -0.1]], np.float32)
    rgb = np.array([[0.9, 0.1, 0.1], [0.1, 0.8, 0.2], [0.2, 0.2, 0.9]], np.float32)
    g = GaussianParams(
        xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rgb2sh(rgb))[:, None, :],
        f_rest=jnp.zeros((3, 0, 3)),
        scaling=jnp.full((3, 3), np.log(0.15)),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (3, 1)),
        opacity=jnp.full((3, 1), float(inverse_sigmoid(jnp.asarray(0.9)))),
        alive=jnp.ones(3, bool),
    )
    cams = orbit_cameras(n_views, radius=2.0, fov_deg=60, resolution=res)
    bg = jnp.ones(3)
    images = []
    out_cams = []
    for cam in cams:
        out = render(g, cam, bg, config=RasterizeConfig(8, 2))
        images.append(np.asarray(out.image))
        out_cams.append(dataclasses.replace(cam, image=np.asarray(out.image)))
    return out_cams


@pytest.mark.slow
def test_gs_fitting_converges():
    cams = _target_scene(res=32, n_views=4)
    cfg = GSTrainConfig(
        iterations=300, lambda_dssim=0.2, lambda_opacity=0.0,
        densify_from_iter=100, densification_interval=120,
        opacity_reset_interval=10_000, max_per_tile=64, tile_chunk=2)
    trainer = GSTrainer(cams, cfg, num_pts=256, capacity=512, seed=0,
                        radius=0.8)
    losses = []
    densify_stats = []
    for _ in range(300):
        stats = trainer.train_iter()
        losses.append(stats["loss"])
        if "cloned" in stats:
            densify_stats.append(stats)
    assert np.isfinite(losses).all()
    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.7, f"loss did not drop: {early} -> {late}"
    # densification ran at iters 240 (>densify_from_iter, % interval == 0)
    assert densify_stats, "densify never ran"
    # render view 0 and compare vs target
    out = trainer.render_view(0)
    img = np.asarray(out.image)
    tgt = cams[0].image
    mse = np.mean((img - tgt) ** 2)
    assert mse < 0.05


def test_ply_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    g = {
        "xyz": rs.randn(10, 3).astype(np.float32),
        "f_dc": rs.randn(10, 1, 3).astype(np.float32),
        "f_rest": rs.randn(10, 3, 3).astype(np.float32),
        "scaling": rs.randn(10, 3).astype(np.float32),
        "rotation": rs.randn(10, 4).astype(np.float32),
        "opacity": rs.randn(10, 1).astype(np.float32),
        "alive": np.ones(10, bool),
    }
    g["alive"][7] = False
    path = str(tmp_path / "test.ply")
    save_ply(path, g)
    g2 = load_ply(path)
    assert g2["xyz"].shape == (9, 3)
    keep = np.ones(10, bool)
    keep[7] = False
    for k in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"):
        np.testing.assert_allclose(g2[k], g[k][keep], rtol=1e-6)


def test_packed_ply(tmp_path):
    from v3d_tpu.gs.ply import save_packed_ply

    rs = np.random.RandomState(0)
    g = {
        "xyz": rs.randn(5, 3).astype(np.float32),
        "f_dc": rs.randn(5, 1, 3).astype(np.float32),
        "f_rest": np.zeros((5, 0, 3), np.float32),
        "scaling": rs.randn(5, 3).astype(np.float32),
        "rotation": rs.randn(5, 4).astype(np.float32),
        "opacity": rs.randn(5, 1).astype(np.float32),
        "alive": np.ones(5, bool),
    }
    path = str(tmp_path / "packed.ply")
    save_packed_ply(path, g)
    data = open(path, "rb").read()
    assert b"property float opacity" in data
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    body = np.frombuffer(data[header_end:], np.float32).reshape(5, 14)
    np.testing.assert_allclose(body[:, :3], g["xyz"], rtol=1e-6)
    # activated opacity in [0,1], normalized quats
    assert (body[:, 3] >= 0).all() and (body[:, 3] <= 1).all()
    np.testing.assert_allclose(np.linalg.norm(body[:, 7:11], axis=1), 1.0,
                               rtol=1e-5)


def test_train_chunk_matches_per_iter():
    """The lax.scan chunked path produces the same params as per-iter
    stepping with the same camera order and events off."""
    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    res = 32
    frames = [np.random.RandomState(i).rand(res, res, 3).astype(np.float32)
              for i in range(4)]
    cams = orbit_cameras(4, resolution=res, images=frames)
    cfg = GSTrainConfig(densify_from_iter=10**9,
                        opacity_reset_interval=10**9, chunk_size=3)

    t1 = GSTrainer(cams, cfg, num_pts=64, capacity=96, seed=0)
    t2 = GSTrainer(cams, cfg, num_pts=64, capacity=96, seed=0)
    order = [0, 1, 2, 3, 1, 0]
    for i in order:
        t1.train_iter(i)
    t2.train_chunk(len(order), cam_indices=np.asarray(order))

    for k in t1.params:
        np.testing.assert_allclose(np.asarray(t1.params[k]),
                                   np.asarray(t2.params[k]),
                                   rtol=2e-4, atol=2e-5)
    assert t1.step_count == t2.step_count


@pytest.mark.slow
def test_train_handles_event_boundaries():
    """train() fires densify/reset at exact multiples, same as the per-iter
    loop (smoke: final alive counts match)."""
    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    res = 32
    frames = [np.random.RandomState(i).rand(res, res, 3).astype(np.float32)
              for i in range(4)]
    cams = orbit_cameras(4, resolution=res, images=frames)
    cfg = GSTrainConfig(densify_from_iter=4, densification_interval=8,
                        opacity_reset_interval=10**9, densify_until_iter=100,
                        chunk_size=4, white_background=False)
    tr = GSTrainer(cams, cfg, num_pts=64, capacity=128, seed=0)
    tr.train(20)
    assert tr.step_count == 20
    assert np.isfinite(float(np.asarray(tr.params["xyz"]).sum()))


def test_device_densify_matches_host():
    """densify_and_prune_jnp == the numpy reference path for a mixed
    clone/prune case (exact), and structurally for splits (random offsets
    use different rngs)."""
    import jax
    import jax.numpy as jnp

    from v3d_tpu.gs.densify import (DensifyState, densify_and_prune,
                                    densify_and_prune_jnp)

    rs = np.random.RandomState(0)
    cap = 64
    alive = np.zeros(cap, bool)
    alive[:40] = True
    g = {
        "xyz": rs.randn(cap, 3).astype(np.float32),
        "f_dc": rs.randn(cap, 1, 3).astype(np.float32),
        "f_rest": rs.randn(cap, 15, 3).astype(np.float32),
        "scaling": np.log(np.full((cap, 3), 0.005, np.float32)),  # small
        "rotation": rs.randn(cap, 4).astype(np.float32),
        "opacity": np.full((cap, 1), 2.0, np.float32),
    }
    # a few low-opacity gaussians to prune, a few high-grad to clone
    g["opacity"][5:8] = -8.0
    grad_accum = np.zeros(cap, np.float32)
    grad_accum[10:20] = 1.0
    denom = np.ones(cap, np.float32)
    max_radii = np.zeros(cap, np.float32)

    host = {k: v.copy() for k, v in g.items()}
    host["alive"] = alive.copy()
    host, _, hstats = densify_and_prune(
        host, DensifyState(grad_accum.copy(), denom.copy(),
                           max_radii.copy()),
        np.random.RandomState(1), max_grad=0.5, min_opacity=0.005,
        extent=2.0, max_screen_size=0.0, percent_dense=0.01)

    jp = {k: jnp.asarray(v) for k, v in g.items()}
    new_p, new_alive, touched, dstats = jax.jit(
        densify_and_prune_jnp,
        static_argnames=("max_screen_size",))(
        jp, jnp.asarray(alive), jnp.asarray(grad_accum),
        jnp.asarray(denom), jnp.asarray(max_radii),
        jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=2.0, max_screen_size=0.0, percent_dense=0.01)

    # no splits here (all scales small -> clones only): exact equality
    assert int(dstats["split"]) == hstats["split"] == 0
    assert int(dstats["cloned"]) == hstats["cloned"] == 10
    assert int(dstats["pruned"]) == hstats["pruned"] == 3
    np.testing.assert_array_equal(np.asarray(new_alive), host["alive"])
    for k in g:
        np.testing.assert_allclose(np.asarray(new_p[k]), host[k],
                                   err_msg=k)

    # split case: make scales large so high-grad gaussians split
    g2 = {k: v.copy() for k, v in g.items()}
    g2["scaling"] = np.log(np.full((cap, 3), 0.5, np.float32))
    host2 = {k: v.copy() for k, v in g2.items()}
    host2["alive"] = alive.copy()
    host2, _, hstats2 = densify_and_prune(
        host2, DensifyState(grad_accum.copy(), denom.copy(),
                            max_radii.copy()),
        np.random.RandomState(1), max_grad=0.5, min_opacity=0.005,
        extent=2.0, max_screen_size=0.0, percent_dense=0.01)
    jp2 = {k: jnp.asarray(v) for k, v in g2.items()}
    new_p2, new_alive2, _, dstats2 = jax.jit(
        densify_and_prune_jnp,
        static_argnames=("max_screen_size",))(
        jp2, jnp.asarray(alive), jnp.asarray(grad_accum),
        jnp.asarray(denom), jnp.asarray(max_radii),
        jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=2.0, max_screen_size=0.0, percent_dense=0.01)
    assert int(dstats2["split"]) == hstats2["split"] == 20
    np.testing.assert_array_equal(np.asarray(new_alive2), host2["alive"])
    # children land in the same slots with the same colors/scales
    np.testing.assert_allclose(np.asarray(new_p2["scaling"]),
                               host2["scaling"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_p2["f_dc"]), host2["f_dc"])


def test_trainer_device_densify_runs():
    """The trainer's device densify event allocates and keeps training."""
    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    res = 32
    frames = [np.random.RandomState(i).rand(res, res, 3).astype(np.float32)
              for i in range(4)]
    cams = orbit_cameras(4, resolution=res, images=frames)
    cfg = GSTrainConfig(densify_from_iter=2, densification_interval=4,
                        densify_until_iter=100, densify_grad_threshold=1e-6,
                        opacity_reset_interval=10**9, chunk_size=4,
                        white_background=False)
    tr = GSTrainer(cams, cfg, num_pts=32, capacity=128, seed=0)
    tr.train(12)
    n_alive = int(np.asarray(tr.alive).sum())
    assert n_alive > 32  # densification actually added gaussians
    assert np.isfinite(float(np.asarray(tr.params["xyz"]).sum()))


def test_opacity_decay_and_reset_modes():
    """opacity_decay<1 multiplies opacities per step (with zero LRs it is
    the only parameter change); reset_mode="none" skips the white-bg /
    interval opacity resets entirely."""
    cams = _target_scene()
    cfg = GSTrainConfig(
        iterations=4, densify_from_iter=2, densification_interval=100,
        opacity_reset_interval=4, max_per_tile=8, tile_chunk=2,
        position_lr_init=0.0, position_lr_final=0.0, feature_lr=0.0,
        opacity_lr=0.0, scaling_lr=0.0, rotation_lr=0.0, lambda_opacity=0.0,
        opacity_reset_mode="none", opacity_decay=0.9, chunk_size=1)
    tr = GSTrainer(cams, cfg, num_pts=16, capacity=16, seed=0)
    op0 = np.asarray(jnp.clip(jax.nn.sigmoid(tr.params["opacity"]), 0, 1))
    tr.train_iter()
    op1 = np.asarray(jax.nn.sigmoid(tr.params["opacity"]))
    np.testing.assert_allclose(op1, np.clip(op0 * 0.9, 1e-6, 1 - 1e-6),
                               rtol=1e-5)
    # mode="none": crossing iter 2 (white-bg densify_from) and 4 (interval)
    # must not clamp opacities to 0.01
    tr.train_iter(); tr.train_iter(); tr.train_iter()
    op4 = np.asarray(jax.nn.sigmoid(tr.params["opacity"]))
    assert op4.max() > 0.05  # hard reset would clamp all to <= 0.01
    np.testing.assert_allclose(op4, np.clip(op0 * 0.9 ** 4, 1e-6, 1), rtol=1e-4)
