"""NeuS train-step timing: uniform vs coarse-to-fine sampling (VERDICT r2
item 4 gate: <100 ms/step at the reference budget with quality unchanged).

Runs the real NeusTrainer train_chunk at the TPU recipe (frequency encoding,
analytic_fwd grads, ray_chunk) on the synthetic checkered-sphere scene, then
fits both variants for --steps and reports holdout PSNR + ms/step.

    python benchmarks/neus_c2f_bench.py --res 256 --steps 600
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

from benchmarks.quality_bench import psnr, render_gt
from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
from v3d_tpu.nerf.system import NeusConfig, NeusTrainer


def run_variant(tag: str, imgs, masks, dirs, poses_gl, train_ids, hold_ids,
                res: int, steps: int, c2f: int, samples: int, rays: int):
    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = NeusConfig(
        num_samples_per_ray=samples, train_num_rays=rays,
        max_train_num_rays=rays, dynamic_ray_sampling=False,
        lambda_normal=0.0, lambda_3d_normal_smooth=1.0,
        geometry_encoding="frequency",
        grad_type="analytic_fwd" if on_tpu else "analytic",
        geo_neurons=128 if on_tpu else 32,
        geo_hidden_layers=4 if on_tpu else 1,
        use_occ_lookup=False, ray_chunk=128 if on_tpu else 0,
        max_steps=steps, cos_anneal_end=min(steps, 5000),
        coarse_to_fine_samples=c2f,
        background_color="white")
    trainer = NeusTrainer(imgs[train_ids], masks[train_ids], dirs,
                          poses_gl[train_ids], config=cfg, seed=0)
    # warmup + compile
    trainer.train(50, chunk=50)
    float(trainer.train_chunk(50)["loss"])  # sync
    t0 = time.time()
    n_timed = min(200, steps - 100)
    trainer.train(n_timed, chunk=50)
    # host sync via a scalar fetch (block_until_ready under-reports through
    # the tunnel, utils/profiling docstring)
    float(trainer.train_chunk(50)["loss"])
    ms = (time.time() - t0) / (n_timed + 50) * 1e3
    rest = steps - trainer.global_step
    if rest > 0:
        trainer.train(rest, chunk=50)
    hold = []
    for i in hold_ids:
        rgb, _, _ = trainer.render_image(poses_gl[i])
        hold.append(psnr(np.clip(rgb, 0, 1), imgs[i]))
    out = {"variant": tag, "ms_per_step": round(ms, 1),
           "neus_field": cfg.geometry_encoding,
           "neus_grad_type": cfg.grad_type,
           "holdout_psnr_db": round(float(np.mean(hold)), 2),
           "steps": steps, "samples": samples, "rays": rays, "c2f": c2f}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--c2f", type=int, default=64)
    ap.add_argument("--tag", default="c2f")
    args = ap.parse_args()

    n_all = 20
    imgs, masks = render_gt(args.res, n_all)
    poses_gl = get_uniform_poses(n_all, 2.0, 15.0, opengl=True)
    train_ids = list(range(0, n_all, 2))
    hold_ids = [1, 9]
    focal = args.res / (2 * np.tan(np.deg2rad(30.0)))
    dirs = get_ray_directions(args.res, args.res, focal)

    results = [
        run_variant("uniform", imgs, masks, dirs, poses_gl, train_ids,
                    hold_ids, args.res, args.steps, 0, args.samples,
                    args.rays),
        run_variant("coarse_to_fine", imgs, masks, dirs, poses_gl, train_ids,
                    hold_ids, args.res, args.steps, args.c2f, args.samples,
                    args.rays),
        # the actual speed play: the tightened band lets a quarter fine
        # budget cover the surface at the same density as 1024 uniform
        run_variant("c2f_quarter_budget", imgs, masks, dirs, poses_gl,
                    train_ids, hold_ids, args.res, args.steps, args.c2f,
                    max(64, args.samples // 4), args.rays),
    ]
    path = os.path.join(_repo, "benchmarks", "results",
                        f"neus_{args.tag}.json")
    from benchmarks._io import write_json
    write_json(path, results)


if __name__ == "__main__":
    main()
