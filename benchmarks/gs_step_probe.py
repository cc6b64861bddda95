"""One-step GS train probe at a given capacity (TPU crash bisect).

    python benchmarks/gs_step_probe.py --cap 300000 [--pts 100000]
        [--res 512] [--kc 16384] [--chunk 0]

chunk=0 runs a single per-iter jit step; chunk>0 runs one scan chunk of
that length.  Prints the fetched loss and step timing.
"""

from __future__ import annotations

import argparse
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

from benchmarks.quality_bench import render_gt
from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--pts", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=300_000)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--kc", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    imgs, _ = render_gt(args.res, args.views)
    poses = get_uniform_poses(args.views, 2.0, 15.0, opengl=False)
    cams = [Camera.from_c2w(poses[i], 60.0, args.res, args.res,
                            image=imgs[i]) for i in range(args.views)]
    cfg = GSTrainConfig(densify_from_iter=10**9, opacity_reset_interval=10**9,
                        lambda_opacity=0.0, max_per_tile=args.k,
                        max_per_coarse=args.kc,
                        chunk_size=max(args.chunk, 2))
    trainer = GSTrainer(cams, cfg, num_pts=args.pts, capacity=args.cap,
                        seed=0, radius=2.0)
    print(f"probe cap={args.cap} pts={args.pts} kc={args.kc} "
          f"chunk={args.chunk}", flush=True)
    for i in range(args.iters):
        t0 = time.time()
        if args.chunk:
            stats = trainer.train_chunk(args.chunk)
        else:
            stats = trainer.train_iter()
        loss = float(stats["loss"])
        print(f"iter {i}: loss={loss:.4f} wall={time.time()-t0:.2f}s",
              flush=True)
    print("probe OK", flush=True)


if __name__ == "__main__":
    main()
