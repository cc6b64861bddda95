"""Elastic recovery (SURVEY §5 — the reference has none; closest analogs are
Lightning --resume (mesh_recon/launch.py:127-131) and gaussians.capture()
(recon/train_from_vid.py:53-55)): latest/prune checkpoint helpers, exact
resume-equality of the diffusion fit loop, and GS/NeuS capture/restore."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.core.checkpoint import latest_checkpoint, prune_checkpoints


def _mkckpt(d, name):
    p = d / name
    p.mkdir()
    (p / "x").write_text("x")
    return p


def test_latest_and_prune(tmp_path):
    assert latest_checkpoint(str(tmp_path / "missing")) is None
    _mkckpt(tmp_path, "step_2")
    _mkckpt(tmp_path, "step_10")
    _mkckpt(tmp_path, "step_6")
    _mkckpt(tmp_path, "step_junk")          # unparseable -> ignored
    _mkckpt(tmp_path, "other_4")            # wrong prefix -> ignored
    _mkckpt(tmp_path, "step_99.orbax-checkpoint-tmp-123")  # in-flight save
    assert latest_checkpoint(str(tmp_path)).endswith("step_10")
    prune_checkpoints(str(tmp_path), keep=2)
    names = {p.name for p in tmp_path.iterdir()}
    assert "step_2" not in names
    assert {"step_6", "step_10"} <= names


class _QuadEngine:
    """Minimal engine contract for DiffusionTrainer: a quadratic pull of the
    params toward per-step noise, so the loss depends on (params, rng) and
    resume-equality is exact only if the restored run replays the same RNG
    stream."""

    num_frames = 1

    def training_loss(self, params, rng, latents, cond, num_frames):
        tgt = jax.random.normal(rng, params["w"].shape)
        return jnp.sum((params["w"] - tgt) ** 2) + 0.0 * jnp.sum(latents)


def _fit(trainer, steps, prefetch=False):
    def batches():
        while True:
            yield {"latents": np.ones((8, 4), np.float32), "cond": {}}

    trainer.fit(batches(), max_steps=steps, log_fn=lambda s: None,
                prefetch=prefetch)


def test_diffusion_fit_resume_exact(tmp_path):
    from v3d_tpu.engines.trainer import DiffusionTrainer, TrainConfig

    # fresh params per trainer: the jitted step DONATES param buffers, and
    # device_put may alias an already-committed input array
    mk = lambda cfg: DiffusionTrainer(
        _QuadEngine(), {"w": jnp.arange(6.0).reshape(2, 3)}, cfg)

    # uninterrupted run: 6 steps, through the prefetch pipeline (result must
    # be identical to the unprefetched runs below)
    a = mk(TrainConfig(log_every=100))
    _fit(a, 6, prefetch=True)

    # interrupted run: 3 steps, checkpoint, then a FRESH process resumes
    ckdir = str(tmp_path / "ck")
    cfg = TrainConfig(log_every=100, ckpt_dir=ckdir, ckpt_every=3,
                      keep_last=2)
    b = mk(cfg)
    _fit(b, 3)
    assert latest_checkpoint(ckdir).endswith("step_3")

    c = mk(cfg)
    _fit(c, 6)  # auto_resume picks up step_3, trains 3 more
    assert c.step == 6
    np.testing.assert_allclose(np.asarray(c.params["w"]),
                               np.asarray(a.params["w"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c.ema_params["w"]),
                               np.asarray(a.ema_params["w"]), rtol=1e-6)
    # optimizer moments restored too
    la = jax.tree_util.tree_leaves(a.opt_state)
    lc = jax.tree_util.tree_leaves(c.opt_state)
    for xa, xc in zip(la, lc):
        np.testing.assert_allclose(np.asarray(xc), np.asarray(xa), rtol=1e-6)


def _gs_scene(res=16, n=2):
    from v3d_tpu.data.cameras import orbit_cameras

    rng = np.random.RandomState(0)
    cams = orbit_cameras(n, radius=2.0, fov_deg=60, resolution=res)
    return [dataclasses.replace(
        c, image=rng.rand(res, res, 3).astype(np.float32)) for c in cams]


def test_gs_capture_restore_resume(tmp_path):
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    cams = _gs_scene()
    cfg = GSTrainConfig(densify_from_iter=10_000, opacity_reset_interval=10_000,
                        max_per_tile=8, tile_chunk=2, lambda_opacity=0.0)
    # same-instance restore (shares the jitted step; the cross-instance /
    # fresh-process case is covered by test_diffusion_fit_resume_exact):
    # any state capture() missed would carry step-6 values into the restored
    # run and diverge from the straight-through result.
    a = GSTrainer(cams, cfg, num_pts=64, capacity=128, seed=0, radius=0.8)
    for i in range(4):
        a.train_iter(cam_idx=i % 2)
    a.save(str(tmp_path / "gs"))
    for i in range(4, 6):
        a.train_iter(cam_idx=i % 2)
    ref = {k: np.asarray(v) for k, v in a.params.items()}

    a.load(str(tmp_path / "gs"))
    assert a.step_count == 4
    for i in range(4, 6):
        a.train_iter(cam_idx=i % 2)
    for k in ref:
        np.testing.assert_allclose(np.asarray(a.params[k]), ref[k],
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_neus_capture_restore_resume(tmp_path):
    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    res, n = 8, 2
    poses = get_uniform_poses(n, 2.0, 0.0, opengl=True)
    focal = res / (2 * np.tan(np.deg2rad(30)))
    dirs = get_ray_directions(res, res, focal)
    images = np.full((n, res, res, 3), 0.5, np.float32)
    fg = np.ones((n, res, res), np.float32)
    cfg = NeusConfig(num_samples_per_ray=16, train_num_rays=32,
                     max_train_num_rays=32, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     geometry_encoding="frequency", grad_type="analytic",
                     geo_neurons=16, geo_hidden_layers=1, n_frequencies=4,
                     use_occ_lookup=False, max_steps=20)
    a = NeusTrainer(images, fg, dirs, poses, config=cfg, seed=0)
    for _ in range(2):
        a.train_iter()
    a.save(str(tmp_path / "neus"))
    for _ in range(2):
        a.train_iter()
    ref = [np.asarray(x) for x in jax.tree_util.tree_leaves(a.params)]

    a.load(str(tmp_path / "neus"))  # same-instance: see GS test note
    assert a.global_step == 2
    for _ in range(2):
        a.train_iter()
    for xa, xr in zip(jax.tree_util.tree_leaves(a.params), ref):
        np.testing.assert_allclose(np.asarray(xa), xr, rtol=1e-5, atol=1e-7)
