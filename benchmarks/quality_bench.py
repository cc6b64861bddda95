"""Reconstruction QUALITY benchmark (novel-view PSNR on synthetic GT).

Answers SURVEY §4's golden-metric requirement in an offline-runnable way:
the CUDA reference can't execute here, so ground truth comes from an
INDEPENDENT subsystem — a checkered icosphere rendered by the mesh
rasterizer (meshops) — and the 3DGS / NeuS trainers are scored on held-out
orbit views they never saw.

    python benchmarks/quality_bench.py [--res 256] [--gs-iters 2000]
                                       [--neus-steps 1000] [--skip-neus]

Writes benchmarks/results/quality_<tag>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax as _jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(_repo, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir",
                   os.path.join(_repo, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def icosphere(subdiv: int = 4):
    """Octahedron subdivided ``subdiv`` times, projected to the sphere."""
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    for _ in range(subdiv):
        cache = {}
        nv = v.tolist()

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (v[a] + v[b]) / 2
                m = m / np.linalg.norm(m)
                cache[key] = len(nv)
                nv.append(m.tolist())
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(nv)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        f = np.asarray(nf)
    return v.astype(np.float32) * 0.6, f.astype(np.int32)


def checker_colors(v: np.ndarray) -> np.ndarray:
    s = 6.0
    pat = (np.sin(s * v[:, 0]) * np.sin(s * v[:, 1]) * np.sin(s * v[:, 2]))
    base = np.where(pat[:, None] > 0,
                    np.asarray([[0.9, 0.25, 0.2]]),
                    np.asarray([[0.15, 0.4, 0.85]]))
    shade = 0.75 + 0.25 * (v[:, 2:3] / np.abs(v[:, 2:3]).max())
    return np.clip(base * shade, 0, 1).astype(np.float32)


def render_gt(res: int, n_views: int):
    """GT orbit views via the MESH rasterizer (independent of GS/NeuS)."""
    import jax.numpy as jnp

    from v3d_tpu.data.cameras import get_uniform_poses
    from v3d_tpu.meshops.rasterize import (MeshRasterizer,
                                           perspective_from_fov,
                                           verts_to_clip)

    verts, faces = icosphere(4)
    colors = checker_colors(verts)
    poses_gl = get_uniform_poses(n_views, 2.0, 15.0, opengl=True)
    proj = perspective_from_fov(60.0)
    raster = MeshRasterizer(res, res, max_per_tile=256, tile_chunk=16)
    vj, fj, cj = jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(colors)
    imgs, masks = [], []
    import jax

    @jax.jit
    def one(mvp):
        clip = verts_to_clip(vj, mvp)
        out = raster(clip, fj, cj)
        img = out.attr * out.mask[..., None] + (1 - out.mask[..., None])
        return img, out.mask

    for p in poses_gl:
        mvp = jnp.asarray(proj @ np.linalg.inv(p))
        img, mask = one(mvp)
        imgs.append(np.asarray(img))
        masks.append(np.asarray(mask))
    return np.stack(imgs), np.stack(masks).astype(np.float32)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def bench_gs(res: int, iters: int, k: int = 1024, kc: int = 16384,
             num_pts: int = 100_000, capacity: int = 300_000,
             lambda_dssim: float = 0.2, lpips_npz: str = None,
             opacity_reset_interval: int = 3000,
             opacity_reset_mode: str = "hard",
             opacity_decay: float = 1.0):
    from v3d_tpu.data.cameras import Camera, get_uniform_poses
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    n_all = 36
    imgs, _ = render_gt(res, n_all)
    poses_cv = get_uniform_poses(n_all, 2.0, 15.0, opengl=False)
    train_ids = list(range(0, n_all, 2))
    hold_ids = list(range(1, n_all, 2))
    cams_train = [Camera.from_c2w(poses_cv[i], 60.0, res, res,
                                  image=imgs[i]) for i in train_ids]
    # generous per-tile K: the fixed top-K selection is the TPU static-
    # shape compromise for the reference's unbounded per-tile lists; with
    # K << overlapping-gaussians most of a random init never receives
    # gradient and the fit stalls (measured: K=256 stalls at ~10dB, K=2048
    # converges)
    # lambda_opacity=0 here: the reference's 0.1*mean(opacity) term is a
    # floater regularizer for real captures; on a synthetic object at this
    # point budget its consistent negative gradient + Adam normalization
    # drives a global opacity collapse (measured: alive 20000 -> 0 within
    # 400 iters).  The rest is the train_from_vid recipe.
    lpips_fn = None
    lambda_lpips = 0.0
    if lpips_npz:
        # weights-day path: the full V3D readme step-4 recipe incl. the
        # perceptual term (train_from_vid.py:134-135)
        from v3d_tpu.metrics.lpips import load_lpips
        lpips_fn = load_lpips(lpips_npz)
        lambda_lpips = 2.0
    # opacity_reset_interval=3000 is the reference default
    # (arguments/__init__.py:99): the refpoint fit resets at iter 3000 AND
    # at densify_from (white bg), exactly like train_from_vid
    cfg = GSTrainConfig(iterations=iters, densify_from_iter=500,
                        densification_interval=100,
                        densify_until_iter=min(iters, 15_000),
                        opacity_reset_interval=opacity_reset_interval,
                        opacity_reset_mode=opacity_reset_mode,
                        opacity_decay=opacity_decay,
                        lambda_opacity=0.0,
                        lambda_dssim=lambda_dssim, lambda_lpips=lambda_lpips,
                        max_per_tile=k, max_per_coarse=kc)
    # radius here is the reference's randn*radius/16 init spread, where
    # radius is the CAMERA ORBIT radius (dataset_readers.py:481: the
    # VideoNVS orbit at 2.0 -> sigma 0.125).  Round 2 passed 0.7 ("object
    # radius"), cramming the init into a sigma-0.044 blob that cannot
    # migrate out to the object in 4000 iters — a major cause of the
    # 16.5 dB underfit (512^2 with 0.7: 11.5 dB; with 2.0: see
    # quality_r3*.json).
    # num_pts=100_000 is the reference operating point
    # (dataset_readers.py:455 constructVideoNVSInfo num_pts).  Round 2/3
    # benched 20k pts with a 60k cap: densification saturated the cap within
    # ~400 iters of densify_from and the fit stalled (alive pinned at 51k,
    # 11.5-14.2 dB).  The reference grows its tensors unbounded; 3x the
    # init count covers the growth seen over a 4000-iter fit.
    trainer = GSTrainer(cams_train, cfg, num_pts=num_pts, capacity=capacity,
                        seed=0, radius=2.0, lpips_fn=lpips_fn)

    import time as _time

    from v3d_tpu.gs.losses import ssim as _ssim_raw

    import jax as _jx
    gs_ssim = _jx.jit(_ssim_raw)

    traj = []
    probe_cam = Camera.from_c2w(poses_cv[hold_ids[0]], 60.0, res, res)
    t_start = _time.time()

    import jax
    import jax.numpy as jnp

    # jit the probe render: eager per-op dispatch through the tunneled TPU
    # (~50ms/op) made probes dominate the round-3 diag run's wall clock
    @jax.jit
    def probe_render(fp, alive, wvt, fpt, center, bg):
        return trainer._render(fp, alive, wvt, fpt, center, None, bg).image

    probe_wvt = jnp.asarray(probe_cam.world_view_transform)
    probe_fpt = jnp.asarray(probe_cam.full_proj_transform)
    probe_center = jnp.asarray(probe_cam.camera_center)

    def log_fn(stats):
        img = probe_render(trainer.params, trainer.alive, probe_wvt,
                           probe_fpt, probe_center, jnp.ones(3))
        img = np.clip(np.asarray(img), 0, 1)
        row = {"iter": int(stats["iter"]),
               "loss": round(float(stats["loss"]), 4),
               "alive": int(np.asarray(trainer.alive).sum()),
               "holdout_psnr": round(psnr(img, imgs[hold_ids[0]]), 2),
               "holdout_ssim": round(float(gs_ssim(
                   jnp.asarray(img), jnp.asarray(imgs[hold_ids[0]]))), 4),
               "t": round(_time.time() - t_start, 1)}
        traj.append(row)
        print(json.dumps(row), flush=True)

    # probe every 100 iters: that is the densification cadence, so the
    # trajectory resolves each densify event and the white-bg opacity reset
    # (reference-faithful, train_from_vid.py:193-196) individually
    trainer.train(iters, log_every=100, log_fn=log_fn)

    def eval_view(i):
        cam = Camera.from_c2w(poses_cv[i], 60.0, res, res)
        img = probe_render(trainer.params, trainer.alive,
                           jnp.asarray(cam.world_view_transform),
                           jnp.asarray(cam.full_proj_transform),
                           jnp.asarray(cam.camera_center), jnp.ones(3))
        return psnr(np.clip(np.asarray(img), 0, 1), imgs[i])

    train_psnr = np.mean([eval_view(i) for i in train_ids[:6]])
    hold_psnrs = [eval_view(i) for i in hold_ids[:6]]
    # event-transient guard: the white-bg opacity reset at densify_from_iter
    # (reference-faithful) must RECOVER — compare each probe against the best
    # of the two probes that follow 200 iters later; a persistent drop >3 dB
    # means densify/reset surgery is destroying quality (VERDICT r3 weak #4)
    ps = [r["holdout_psnr"] for r in traj]
    worst_persistent = 0.0
    for i in range(len(ps) - 2):
        drop = ps[i] - max(ps[i + 1:i + 3])
        worst_persistent = max(worst_persistent, drop)
    worst_instant = max((ps[i] - ps[i + 1] for i in range(len(ps) - 1)),
                        default=0.0)
    return {"gs_iters": iters, "gs_num_pts": num_pts, "gs_capacity": capacity,
            "gs_reset_mode": opacity_reset_mode,
            "gs_opacity_decay": opacity_decay,
            "gs_k": k, "gs_kc": kc, "gs_lambda_dssim": lambda_dssim,
            "gs_lpips": "ABSENT offline - V3D recipe adds lambda_lpips=2.0 "
                        "(train_from_vid.py:134-135); numbers are L1/DSSIM-only",
            "gs_train_psnr_db": round(float(train_psnr), 2),
            "gs_holdout_psnr_db": round(float(np.mean(hold_psnrs)), 2),
            "gs_transient_instant_db": round(worst_instant, 2),
            "gs_transient_persistent_db": round(worst_persistent, 2),
            "gs_wall_s": round(_time.time() - t_start, 1),
            "gs_traj": traj}


def bench_neus(res: int, steps: int):
    import jax

    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    n_all = 20
    imgs, masks = render_gt(res, n_all)
    poses_gl = get_uniform_poses(n_all, 2.0, 15.0, opengl=True)
    train_ids = list(range(0, n_all, 2))
    hold_ids = [1, 9]
    focal = res / (2 * np.tan(np.deg2rad(30.0)))
    dirs = get_ray_directions(res, res, focal)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # the SHIPPED recon_neus recipe (apps/recon_neus.py:84-94): surface-
    # guided c2f with quarter fine budget on TPU — the quality gate must
    # measure what the product CLI runs (r4 gate used 512 uniform samples:
    # 29.24 dB in 2029 s; the c2f recipe holds PSNR at ~4x the step rate,
    # neus_c2f_r4.json)
    cfg = NeusConfig(
        num_samples_per_ray=256 if on_tpu else 64,
        coarse_to_fine_samples=64 if on_tpu else 0,
        train_num_rays=512 if on_tpu else 64,
        max_train_num_rays=512 if on_tpu else 64,
        dynamic_ray_sampling=False, lambda_normal=0.0,
        lambda_3d_normal_smooth=1.0,
        geometry_encoding="frequency" if on_tpu else "hashgrid",
        grad_type="analytic_fwd" if on_tpu else "finite_difference",
        geo_neurons=128 if on_tpu else 32,
        geo_hidden_layers=4 if on_tpu else 1,
        use_occ_lookup=not on_tpu,
        ray_chunk=128 if on_tpu else 0,
        max_steps=steps, cos_anneal_end=min(steps, 5000),
        background_color="white")
    trainer = NeusTrainer(imgs[train_ids], masks[train_ids], dirs,
                          poses_gl[train_ids], config=cfg, seed=0)
    import time as _time

    from v3d_tpu.gs.losses import ssim as _ssim_raw
    gs_ssim = jax.jit(_ssim_raw)
    import jax.numpy as jnp

    traj = []
    t_start = _time.time()
    probe_every = max(500, steps // 6)
    done = 0
    while done < steps:
        n = min(probe_every, steps - done)
        stats = trainer.train(n)
        done += n
        rgb, _, _ = trainer.render_image(poses_gl[hold_ids[0]])
        rgb = np.clip(rgb, 0, 1)
        row = {"step": done, "loss": round(float(stats["loss"]), 4),
               "holdout_psnr": round(psnr(rgb, imgs[hold_ids[0]]), 2),
               "holdout_ssim": round(float(gs_ssim(
                   jnp.asarray(rgb), jnp.asarray(imgs[hold_ids[0]]))), 4),
               "t": round(_time.time() - t_start, 1)}
        traj.append(row)
        print(json.dumps(row), flush=True)

    hold_psnrs = []
    for i in hold_ids:
        rgb, _, _ = trainer.render_image(poses_gl[i])
        hold_psnrs.append(psnr(np.clip(rgb, 0, 1), imgs[i]))
    return {"neus_steps": steps,
            "neus_field": cfg.geometry_encoding,
            "neus_grad_type": cfg.grad_type,
            "neus_samples": cfg.num_samples_per_ray,
            "neus_c2f": cfg.coarse_to_fine_samples,
            "neus_holdout_psnr_db": round(float(np.mean(hold_psnrs)), 2),
            "neus_wall_s": round(_time.time() - t_start, 1),
            "neus_traj": traj}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--gs-iters", type=int, default=2000)
    ap.add_argument("--gs-k", type=int, default=1024)
    ap.add_argument("--gs-kc", type=int, default=16384)
    ap.add_argument("--gs-pts", type=int, default=100_000)
    ap.add_argument("--gs-cap", type=int, default=300_000)
    # the V3D recipe is --lambda_dssim 1.0 --lambda_lpips 2.0 (readme step 4);
    # LPIPS weights are absent offline, so the 1.0 analog runs pure SSIM
    ap.add_argument("--gs-dssim", type=float, default=0.2)
    ap.add_argument("--gs-reset-interval", type=int, default=3000)
    ap.add_argument("--gs-reset-mode", default="hard",
                    choices=["hard", "none"])
    ap.add_argument("--gs-opacity-decay", type=float, default=1.0)
    ap.add_argument("--lpips-npz", default=None,
                    help="VGG-LPIPS weights npz: adds lambda_lpips=2.0 "
                         "(the full readme step-4 recipe; weights-day only)")
    ap.add_argument("--neus-steps", type=int, default=1000)
    ap.add_argument("--skip-gs", action="store_true")
    ap.add_argument("--skip-neus", action="store_true")
    ap.add_argument("--tag", default="round2")
    args = ap.parse_args()
    out = {"res": args.res}
    if not args.skip_gs:
        out.update(bench_gs(args.res, args.gs_iters, k=args.gs_k,
                            kc=args.gs_kc, num_pts=args.gs_pts,
                            capacity=args.gs_cap,
                            lambda_dssim=args.gs_dssim,
                            lpips_npz=args.lpips_npz,
                            opacity_reset_interval=args.gs_reset_interval,
                            opacity_reset_mode=args.gs_reset_mode,
                            opacity_decay=args.gs_opacity_decay))
        print(json.dumps(out), flush=True)
    if not args.skip_neus:
        out.update(bench_neus(args.res, args.neus_steps))
    print(json.dumps(out), flush=True)
    path = os.path.join(_repo, "benchmarks", "results",
                        f"quality_{args.tag}.json")
    from benchmarks._io import write_json
    write_json(path, out)


if __name__ == "__main__":
    main()
