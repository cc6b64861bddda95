"""NeuS geometry-field A/B at the refpoint: hashgrid+FD vs frequency+analytic.

VERDICT r4 task 5: the reference runs a progressive hashgrid with
finite-difference grads (mesh_recon/models/geometry.py:144-211,
configs/videonvs.yaml: 10 levels x 2 features), while our TPU-fast default
is frequency encoding + analytic grads (XLA TPU gathers cost ~100 ns/row;
a hashgrid lookup is 80 gathered rows per point).  This measures BOTH
fields at the production c2f budget (64 probe + 256 fine samples, 1024
rays) for --steps on the synthetic checkered-sphere scene and records
ms/step + holdout PSNR, settling the TPU default with data.

    python benchmarks/neus_field_ab.py --res 256 --steps 3000

Writes benchmarks/results/neus_field_ab_r5.json.
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
                steps: int, encoding: str, grad_type: str, rays: int,
                samples: int, c2f: int, production_sizing: bool = False):
    on_tpu = jax.default_backend() in ("tpu", "axon")
    kw = dict(geometry_encoding=encoding, grad_type=grad_type)
    if encoding == "frequency":
        # the TPU-fast MLP sizing measured in neus_c2f_r4.json;
        # --production-sizing forces it off-chip too so a CPU quality A/B
        # compares the fields as actually shipped (not a downsized stand-in)
        kw.update(geo_neurons=128 if (on_tpu or production_sizing) else 32,
                  geo_hidden_layers=4 if (on_tpu or production_sizing) else 1)
    cfg = NeusConfig(
        num_samples_per_ray=samples, train_num_rays=rays,
        max_train_num_rays=rays, dynamic_ray_sampling=False,
        lambda_normal=0.0, lambda_3d_normal_smooth=1.0,
        use_occ_lookup=False, ray_chunk=128 if on_tpu else 0,
        max_steps=steps, cos_anneal_end=min(steps, 5000),
        coarse_to_fine_samples=c2f, background_color="white", **kw)
    t_build = time.time()
    trainer = NeusTrainer(imgs[train_ids], masks[train_ids], dirs,
                          poses_gl[train_ids], config=cfg, seed=0)
    trainer.train(50, chunk=50)           # compile + warmup
    float(trainer.train_chunk(50)["loss"])  # sync
    compile_s = time.time() - t_build
    t0 = time.time()
    n_timed = min(200, max(50, steps - 100))
    trainer.train(n_timed, chunk=50)
    float(trainer.train_chunk(50)["loss"])  # scalar host sync
    ms = (time.time() - t0) / (n_timed + 50) * 1e3
    rest = steps - trainer.global_step
    if rest > 0:
        trainer.train(rest, chunk=50)
    hold = []
    for i in hold_ids:
        rgb, _, _ = trainer.render_image(poses_gl[i])
        hold.append(psnr(np.clip(rgb, 0, 1), imgs[i]))
    out = {"variant": tag, "neus_field": encoding,
           "neus_grad_type": grad_type,
           "platform": jax.default_backend(),
           "ms_per_step": round(ms, 1),
           "holdout_psnr_db": round(float(np.mean(hold)), 2),
           "steps": steps, "samples": samples, "rays": rays, "c2f": c2f,
           "compile_warmup_s": round(compile_s, 1),
           "fit_wall_s_est": round(ms * steps / 1e3, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--c2f", type=int, default=64)
    ap.add_argument("--tag", default="field_ab_r5")
    ap.add_argument("--production-sizing", action="store_true",
                    help="force the shipped TPU MLP sizing for the "
                         "frequency field even off-chip (CPU quality A/B)")
    ap.add_argument("--cpu-quality", action="store_true",
                    help="grad-matched off-chip QUALITY A/B: both fields "
                         "with analytic_fwd grads (the FD-grad program is "
                         "a >30 min XLA:CPU compile, and the SIGILL that "
                         "forces FD on TPU is TPU-only), production "
                         "frequency sizing.  ms/step rows are NOT "
                         "TPU-indicative in this mode — only the PSNR is.")
    args = ap.parse_args()
    if args.cpu_quality:
        args.production_sizing = True

    n_all = 20
    imgs, masks = render_gt(args.res, n_all)
    poses_gl = get_uniform_poses(n_all, 2.0, 15.0, opengl=True)
    train_ids = list(range(0, n_all, 2))
    hold_ids = [1, 9]
    focal = args.res / (2 * np.tan(np.deg2rad(30.0)))
    dirs = get_ray_directions(args.res, args.res, focal)

    if args.cpu_quality:
        variants = [("frequency_analytic", "frequency", "analytic_fwd"),
                    ("hashgrid_analytic", "hashgrid", "analytic_fwd")]
    else:
        variants = [
            ("frequency_analytic", "frequency", "analytic_fwd"),
            # the reference field (videonvs.yaml hashgrid, FD grads — the
            # TPU compiler SIGILLs on analytic-inside-grad, CLAUDE.md)
            ("hashgrid_fd", "hashgrid", "finite_difference")]

    results = []
    for tag, enc, grad in variants:
        try:
            results.append(run_variant(
                tag, imgs, masks, dirs, poses_gl, train_ids, hold_ids,
                args.steps, enc, grad, args.rays, args.samples, args.c2f,
                production_sizing=args.production_sizing))
        except Exception as e:
            row = {"variant": tag, "error": f"{type(e).__name__}: {e}"[:400]}
            print(json.dumps(row), flush=True)
            results.append(row)

    from benchmarks._io import write_json
    out_path = os.path.join(_repo, "benchmarks", "results",
                            f"neus_{args.tag}.json")
    if args.cpu_quality and os.path.exists(out_path):
        # append the off-chip quality rows to the on-chip ms/step rows so
        # one artifact carries the whole A/B story
        with open(out_path) as f:
            prior = json.load(f)
        results = prior + results
    write_json(out_path, results)


if __name__ == "__main__":
    main()
