"""Reconstruction benchmarks on TPU: 3DGS fitting iteration (512², 100k
gaussians — the recon/train_from_vid.py workload) and NeuS training step
(1024 samples/ray — the mesh_recon workload).

    python benchmarks/recon_bench.py [--gs-points 100000] [--res 512]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

# persistent compile cache (the remote-compile path is slow; bench.py does
# the same)
import jax as _jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
os.makedirs(_cache, exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", _cache)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_gs(res: int = 512, num_pts: int = 100_000, iters: int = 20):
    import jax

    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    frames = [np.random.RandomState(i).rand(res, res, 3).astype(np.float32)
              for i in range(18)]
    cams = orbit_cameras(18, resolution=res, images=frames)
    cfg = GSTrainConfig(densify_from_iter=10**9, opacity_reset_interval=10**9)
    trainer = GSTrainer(cams, cfg, num_pts=num_pts,
                        capacity=int(num_pts * 1.5))
    trainer.train_iter(0)  # compile per-iter path
    t0 = time.perf_counter()
    for i in range(iters):
        trainer.train_iter(i % 18)
    # sync
    float(np.asarray(trainer.params["xyz"][:1]).sum())
    dt = (time.perf_counter() - t0) / iters

    # chunked path (GSTrainer.train production loop): one dispatch per
    # lax.scan chunk amortizes the ~50ms tunnel dispatch latency
    C = cfg.chunk_size
    trainer.train_chunk(C)  # compile
    float(np.asarray(trainer.params["xyz"][:1]).sum())
    t0 = time.perf_counter()
    reps = max(1, (2 * iters) // C)
    for _ in range(reps):
        trainer.train_chunk(C)
    float(np.asarray(trainer.params["xyz"][:1]).sum())
    dtc = (time.perf_counter() - t0) / (reps * C)
    return {"gs_iter_ms": round(dt * 1e3, 2),
            "gs_chunked_iter_ms": round(dtc * 1e3, 2),
            "gs_4000iter_est_s": round(dtc * 4000, 1)}


def bench_neus(res: int = 512, rays: int = 1024, samples: int = 1024,
               iters: int = 20):
    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    poses = get_uniform_poses(18, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    images = np.zeros((18, res, res, 3), np.float32)
    fg = np.ones((18, res, res), np.float32)
    import jax

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = NeusConfig(num_samples_per_ray=samples, train_num_rays=rays,
                     max_train_num_rays=rays, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=1.0,
                     geometry_encoding="frequency" if on_tpu else "hashgrid",
                     grad_type="analytic_fwd" if on_tpu else "finite_difference",
                     geo_neurons=128 if on_tpu else 64,
                     geo_hidden_layers=4 if on_tpu else 1,
                     use_occ_lookup=not on_tpu,
                     ray_chunk=128 if on_tpu else 0)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg)
    trainer.train_iter()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        trainer.train_iter()
    float(np.asarray(trainer.params["variance"]["params"]["variance"]))  # sync
    dt = (time.perf_counter() - t0) / iters

    # chunked scan path (NeusTrainer.train production loop)
    C = 50
    trainer.train_chunk(C)  # compile
    float(np.asarray(trainer.params["variance"]["params"]["variance"]))
    t0 = time.perf_counter()
    trainer.train_chunk(C)
    trainer.train_chunk(C)
    float(np.asarray(trainer.params["variance"]["params"]["variance"]))
    dtc = (time.perf_counter() - t0) / (2 * C)
    return {"neus_step_ms": round(dt * 1e3, 2),
            "neus_chunked_step_ms": round(dtc * 1e3, 2),
            "neus_3000step_est_s": round(dtc * 3000, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--gs-points", type=int, default=100_000)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-neus", action="store_true")
    p.add_argument("--skip-gs", action="store_true")
    args = p.parse_args()
    out = {}
    if not args.skip_gs:
        out.update(bench_gs(args.res, args.gs_points, args.iters))
        print(json.dumps(out), flush=True)
    if not args.skip_neus:
        out.update(bench_neus(args.res, iters=args.iters))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
