"""Oracle-init 3DGS diagnostic (round-3 underfit investigation).

Places gaussians ON the known GT sphere surface with GT vertex colors and
scores the GS renderer against the mesh-rasterizer GT *without any
training*.  Discriminates the two failure families behind the round-2/3
underfit:

- oracle render PSNR low  -> projection/rasterizer convention mismatch
  between meshops GT and the GS renderer (misalignment blurs every fit).
- oracle render PSNR high -> renderer fine; the optimization dynamics
  (lrs / densify / gradients) are the problem.  The script then takes a
  few training steps FROM the oracle init and from random init and prints
  per-group gradient norms so anomalously weak signals show up.

    PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/gs_oracle.py --res 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(_repo, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from benchmarks.quality_bench import checker_colors, icosphere, psnr, render_gt
from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.gaussians import from_pcd
from v3d_tpu.gs.trainer import FLOAT_FIELDS, GSTrainConfig, GSTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--dump-png", action="store_true")
    args = ap.parse_args()

    res = args.res
    imgs, _ = render_gt(res, args.views)
    poses_cv = get_uniform_poses(args.views, 2.0, 15.0, opengl=False)
    cams = [Camera.from_c2w(poses_cv[i], 60.0, res, res, image=imgs[i])
            for i in range(args.views)]

    # oracle init: gaussians at the GT mesh vertices with GT colors
    verts, _ = icosphere(4)
    colors = checker_colors(verts)
    trainer = GSTrainer(cams, GSTrainConfig(densify_from_iter=10**9,
                                            opacity_reset_interval=10**9,
                                            lambda_opacity=0.0),
                        num_pts=verts.shape[0], capacity=verts.shape[0],
                        seed=0)
    g = from_pcd(verts, colors, sh_degree=0, capacity=verts.shape[0])
    # solid surface: near-opaque
    trainer.params = {k: jnp.asarray(getattr(g, k)) for k in FLOAT_FIELDS}
    trainer.params["opacity"] = jnp.full_like(trainer.params["opacity"], 4.0)
    trainer.alive = jnp.asarray(g.alive)
    trainer.opt_state = trainer.opt.init(trainer.params)

    oracle_psnrs = []
    for k in range(args.views):
        im = np.clip(np.asarray(trainer.render_view(k).image), 0, 1)
        oracle_psnrs.append(psnr(im, imgs[k]))
        if args.dump_png and k == 0:
            from PIL import Image

            Image.fromarray((im * 255).astype(np.uint8)).save(
                os.path.join(_repo, "benchmarks", "results",
                             "gs_oracle_render.png"))
            Image.fromarray((np.clip(imgs[k], 0, 1) * 255).astype(
                np.uint8)).save(
                os.path.join(_repo, "benchmarks", "results",
                             "gs_oracle_gt.png"))
    print(json.dumps({"oracle_psnr_per_view":
                      [round(p, 2) for p in oracle_psnrs]}), flush=True)

    # per-group gradient norms at the oracle init and at random init
    def grad_report(tr, label):
        fp = tr.params

        def loss_fn(fp):
            out = tr._render(fp, tr.alive, tr.cam_wvt[0], tr.cam_fpt[0],
                             tr.cam_center[0], None, jnp.ones(3))
            from v3d_tpu.gs.losses import l1_loss, ssim

            ll1 = l1_loss(out.image, tr.images[0])
            return 0.8 * ll1 + 0.2 * (1.0 - ssim(out.image, tr.images[0]))

        grads = jax.jit(jax.grad(loss_fn))(fp)
        fields = [k for k in FLOAT_FIELDS if grads[k].size]
        norms = {k: float(jnp.linalg.norm(grads[k])) for k in fields}
        mx = {k: float(jnp.max(jnp.abs(grads[k]))) for k in fields}
        print(json.dumps({"label": label,
                          "grad_norm": {k: f"{v:.3e}" for k, v in norms.items()},
                          "grad_maxabs": {k: f"{v:.3e}" for k, v in mx.items()}}),
              flush=True)

    grad_report(trainer, "oracle_init")

    # short fit FROM the oracle init — should stay >= oracle PSNR
    stats = trainer.train(args.steps)
    post = [psnr(np.clip(np.asarray(trainer.render_view(k).image), 0, 1),
                 imgs[k]) for k in range(args.views)]
    print(json.dumps({"post_fit_psnr_per_view": [round(p, 2) for p in post],
                      "loss": round(float(stats["loss"]), 4)}), flush=True)


if __name__ == "__main__":
    main()
