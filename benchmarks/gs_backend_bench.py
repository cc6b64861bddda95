"""GS rasterizer backend shootout at the reference operating point.

Times, at a given (res, cap): projection, coarse binning top_k, forward
render and fwd+bwd for the XLA scan compositor vs the fused Pallas tile
kernel (gs/pallas_raster.py).  One process, all variants — remote TPU
compiles are slow, batch them (CLAUDE.md).

    python benchmarks/gs_backend_bench.py --res 512 --cap 300000 \
        [--pts 100000] [--kc 16384] [--backends xla,pallas]
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

from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.gaussians import from_pcd, random_init_pcd
from v3d_tpu.gs.render import RasterizeConfig, project_gaussians, rasterize


def timeit(name, f, results, n=3):
    f()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    ms = min(ts) * 1e3
    results[name] = round(ms, 2)
    print(f"{name}: {ms:.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--pts", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=300_000)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--kc", type=int, default=16384)
    ap.add_argument("--backends", default="xla,pallas")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    xyz, colors = random_init_pcd(rng, args.pts, radius=2.0)
    g = from_pcd(xyz, colors, sh_degree=0, capacity=args.cap)
    pose = get_uniform_poses(4, 2.0, 15.0, opengl=False)[1]
    cam = Camera.from_c2w(pose, 60.0, args.res, args.res)
    bg = jnp.ones(3)
    target = jnp.zeros((args.res, args.res, 3)) + 0.5

    results = {"res": args.res, "pts": args.pts, "cap": args.cap,
               "k": args.k, "kc": args.kc}

    proj_fn = jax.jit(lambda g: project_gaussians(g, cam))
    proj = proj_fn(g)
    timeit("project", lambda: np.asarray(proj_fn(g).depth[0]), results)

    # isolated coarse binning (the top_k over (n_cells, cap))
    from v3d_tpu.gs.render import TILE

    n_t = -(-args.res // TILE)
    cf = 8
    n_c = -(-n_t // cf)
    ctile = TILE * cf
    Kc = min(args.kc, args.cap)

    @jax.jit
    def binning(proj):
        gx, gy, r = proj.means2d[:, 0], proj.means2d[:, 1], proj.radius
        depth_masked = jnp.where(proj.valid, proj.depth, jnp.inf)
        cxs = (jnp.arange(n_c * n_c) % n_c).astype(jnp.float32) * ctile
        cys = (jnp.arange(n_c * n_c) // n_c).astype(jnp.float32) * ctile
        ov = ((gx[None] + r[None] >= cxs[:, None])
              & (gx[None] - r[None] <= cxs[:, None] + ctile)
              & (gy[None] + r[None] >= cys[:, None])
              & (gy[None] - r[None] <= cys[:, None] + ctile))
        score = jnp.where(ov, depth_masked[None], jnp.inf)
        neg, idx = jax.lax.top_k(-score, Kc)
        return idx

    timeit("binning_topk", lambda: np.asarray(binning(proj)[0, 0]), results)

    imgs, grads = {}, {}
    for backend in args.backends.split(","):
        cfg = RasterizeConfig(max_per_tile=args.k, tile_chunk=32,
                              coarse_factor=cf, max_per_coarse=args.kc,
                              backend=backend)

        rast = jax.jit(lambda p: rasterize(p, cam.height, cam.width, bg, cfg))
        timeit(f"render_fwd[{backend}]",
               lambda: np.asarray(rast(proj).image[0, 0, 0]), results)

        def loss_fn(xyz):
            p = project_gaussians(g._replace(xyz=xyz), cam)
            out = rasterize(p, cam.height, cam.width, bg, cfg)
            return jnp.mean(jnp.abs(out.image - target))

        lf = jax.jit(loss_fn)
        gf = jax.jit(jax.grad(loss_fn))
        timeit(f"fwd_loss[{backend}]",
               lambda: np.asarray(lf(g.xyz)), results)
        timeit(f"fwd_bwd[{backend}]",
               lambda: np.asarray(gf(g.xyz)[0, 0]), results)

        # numeric record: the 300k-cap XLA path once produced impossible
        # losses — keep per-backend values + cross-backend diffs in the JSON
        img = np.asarray(rast(proj).image)
        imgs[backend] = img
        grads[backend] = np.asarray(gf(g.xyz))
        results[f"loss[{backend}]"] = float(np.asarray(lf(g.xyz)))
        results[f"img_mean[{backend}]"] = float(img.mean())
        results[f"img_minmax[{backend}]"] = [float(img.min()), float(img.max())]
    names = list(imgs)
    if len(names) == 2:
        a, b = names
        results["img_maxdiff"] = float(np.abs(imgs[a] - imgs[b]).max())
        gd = np.abs(grads[a] - grads[b])
        gref = np.abs(grads[a]).max() + 1e-12
        results["grad_maxdiff_rel"] = float(gd.max() / gref)
        print(f"img_maxdiff {results['img_maxdiff']:.5f} "
              f"grad_maxdiff_rel {results['grad_maxdiff_rel']:.5f}",
              flush=True)

    print(json.dumps(results), flush=True)
    if args.tag:
        path = os.path.join(_repo, "benchmarks", "results",
                            f"gs_backend_{args.tag}.json")
        from benchmarks._io import write_json
        write_json(path, results)


if __name__ == "__main__":
    main()
