"""3DGS quality diagnostics (round-3 underfit investigation, VERDICT item 1).

Runs a controlled small fit against mesh-rasterizer GT (same protocol as
quality_bench.bench_gs) while recording the signals the round-2 verdict
asked for:

- alive-count + train/holdout PSNR trajectory
- per-tile overlap counts vs the fixed top-K slab (is truncation biting?)
- densification event stats (cloned/split/pruned per event)

    python benchmarks/gs_diag.py --res 128 --iters 1200 --pts 8000 \
        --cap 40000 --k 512 [--tag fix1]

Intended to run on local CPU at small scale (env: JAX_PLATFORMS=cpu,
PYTHONPATH stripped of the axon hook) or on the TPU at full scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(_repo, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from benchmarks.quality_bench import psnr, render_gt
from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.render import TILE
from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer


def tile_overlap_stats(trainer: GSTrainer, cam_idx: int = 0):
    """Per-tile count of valid overlapping gaussians for one camera —
    measures how hard the fixed top-K truncation bites."""
    from v3d_tpu.gs.gaussians import GaussianParams
    from v3d_tpu.gs.render import project_gaussians

    g = GaussianParams(alive=trainer.alive,
                       **{k: trainer.params[k] for k in trainer.params})
    cam = trainer._make_cam(trainer.cam_wvt[cam_idx], trainer.cam_fpt[cam_idx],
                            trainer.cam_center[cam_idx])
    proj = project_gaussians(g, cam)
    n_tx = -(-cam.width // TILE)
    n_ty = -(-cam.height // TILE)
    txs = (jnp.arange(n_tx * n_ty) % n_tx).astype(jnp.float32) * TILE
    tys = (jnp.arange(n_tx * n_ty) // n_tx).astype(jnp.float32) * TILE
    gx = proj.means2d[:, 0]
    gy = proj.means2d[:, 1]
    r = jnp.where(proj.valid, proj.radius, -1.0)

    @jax.jit
    def counts():
        ov = ((gx[None] + r[None] >= txs[:, None])
              & (gx[None] - r[None] <= txs[:, None] + TILE)
              & (gy[None] + r[None] >= tys[:, None])
              & (gy[None] - r[None] <= tys[:, None] + TILE))
        return jnp.sum(ov, axis=1)

    c = np.asarray(counts())
    return {"tile_overlap_max": int(c.max()),
            "tile_overlap_mean": float(c.mean()),
            "tile_overlap_p95": float(np.percentile(c, 95))}


def run(args):
    n_all = args.views * 2
    imgs, _ = render_gt(args.res, n_all)
    poses_cv = get_uniform_poses(n_all, 2.0, 15.0, opengl=False)
    train_ids = list(range(0, n_all, 2))
    hold_ids = list(range(1, n_all, 2))
    cams = [Camera.from_c2w(poses_cv[i], 60.0, args.res, args.res,
                            image=imgs[i]) for i in train_ids]

    cfg = GSTrainConfig(
        iterations=args.iters, densify_from_iter=args.densify_from,
        densification_interval=args.densify_interval,
        densify_until_iter=args.densify_until or args.iters,
        opacity_reset_interval=args.opacity_reset or 10**9,
        lambda_opacity=args.lambda_opacity,
        densify_grad_threshold=args.grad_threshold,
        max_per_tile=args.k, max_per_coarse=args.kc,
        chunk_size=args.chunk)
    trainer = GSTrainer(cams, cfg, num_pts=args.pts, capacity=args.cap,
                        seed=0, radius=args.init_radius)

    traj = []
    t0 = time.time()
    events = []

    seg = args.log_every
    it = 0
    while it < args.iters:
        n = min(seg, args.iters - it)
        stats = trainer.train(n)
        it += n
        alive = int(np.asarray(trainer.alive).sum())
        tr = float(np.mean([
            psnr(np.clip(np.asarray(trainer.render_view(k).image), 0, 1),
                 imgs[i]) for k, i in enumerate(train_ids[:4])]))
        row = {"iter": it, "loss": round(float(stats["loss"]), 4),
               "alive": alive, "train_psnr": round(tr, 2),
               "t": round(time.time() - t0, 1)}
        traj.append(row)
        print(json.dumps(row), flush=True)

    hold_psnrs = []
    for i in hold_ids[:6]:
        cam = Camera.from_c2w(poses_cv[i], 60.0, args.res, args.res)
        out = trainer._render(
            trainer.params, trainer.alive,
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform),
            jnp.asarray(cam.camera_center), None, jnp.ones(3))
        hold_psnrs.append(psnr(np.clip(np.asarray(out.image), 0, 1), imgs[i]))

    if args.dump_png:
        from PIL import Image

        for k, i in [(0, train_ids[0])]:
            im = np.clip(np.asarray(trainer.render_view(k).image), 0, 1)
            Image.fromarray((im * 255).astype(np.uint8)).save(
                os.path.join(_repo, "benchmarks", "results",
                             f"gs_diag_{args.tag}_render.png"))
            Image.fromarray((np.clip(imgs[i], 0, 1) * 255).astype(
                np.uint8)).save(
                os.path.join(_repo, "benchmarks", "results",
                             f"gs_diag_{args.tag}_gt.png"))

    result = {
        "args": {k: v for k, v in vars(args).items()},
        "holdout_psnr": round(float(np.mean(hold_psnrs)), 2),
        "final_train_psnr": traj[-1]["train_psnr"],
        "final_alive": traj[-1]["alive"],
        "overlap": tile_overlap_stats(trainer),
        "traj": traj,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps({k: v for k, v in result.items() if k != "traj"}),
          flush=True)
    if args.tag:
        path = os.path.join(_repo, "benchmarks", "results",
                            f"gs_diag_{args.tag}.json")
        from benchmarks._io import write_json
        write_json(path, result)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--pts", type=int, default=8000)
    ap.add_argument("--cap", type=int, default=40000)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--kc", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--init-radius", type=float, default=2.0)
    ap.add_argument("--densify-from", type=int, default=500)
    ap.add_argument("--densify-interval", type=int, default=100)
    ap.add_argument("--densify-until", type=int, default=0)
    ap.add_argument("--opacity-reset", type=int, default=0)
    ap.add_argument("--lambda-opacity", type=float, default=0.0)
    ap.add_argument("--grad-threshold", type=float, default=0.0002)
    ap.add_argument("--log-every", type=int, default=200)
    ap.add_argument("--tag", default="")
    ap.add_argument("--dump-png", action="store_true")
    args = ap.parse_args()
    run(args)


if __name__ == "__main__":
    main()
