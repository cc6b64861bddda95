"""Stage-level GS render diagnostic for large capacities (round 3).

At cap=300k the one-step probe produced impossible losses (negative) and
12.7 s/step on TPU.  This script times each stage (projection, coarse
binning top_k, full forward, train step) and cross-checks TPU numerics
against the same computation on CPU (subprocess with scrubbed env writes
reference values to an npz first).

    # CPU reference pass (writes /tmp/gs_render_ref.npz):
    PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/gs_render_diag.py \
        --res 128 --cap 300000 --mode ref
    # TPU check:
    python benchmarks/gs_render_diag.py --res 128 --cap 300000 --mode check
    # TPU timing only:
    python benchmarks/gs_render_diag.py --res 512 --cap 300000 --mode time
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

import jax.numpy as jnp

from v3d_tpu.data.cameras import Camera, get_uniform_poses
from v3d_tpu.gs.gaussians import GaussianParams, from_pcd
from v3d_tpu.gs.render import RasterizeConfig, project_gaussians, rasterize
from v3d_tpu.gs.trainer import random_init_pcd

REF = "/tmp/gs_render_ref.npz"


def build(args):
    rng = np.random.RandomState(0)
    xyz, colors = random_init_pcd(rng, args.pts, radius=2.0)
    g = from_pcd(xyz, colors, sh_degree=0, capacity=args.cap)
    pose = get_uniform_poses(4, 2.0, 15.0, opengl=False)[1]
    cam = Camera.from_c2w(pose, 60.0, args.res, args.res)
    cfg = RasterizeConfig(max_per_tile=args.k, tile_chunk=32,
                          coarse_factor=8, max_per_coarse=args.kc)
    return g, cam, cfg


def fetch(x):
    return np.asarray(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--pts", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=300_000)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--kc", type=int, default=16384)
    ap.add_argument("--mode", choices=["ref", "check", "time"],
                    default="time")
    args = ap.parse_args()
    g, cam, cfg = build(args)
    bg = jnp.ones(3)

    proj_fn = jax.jit(lambda g: project_gaussians(g, cam))
    rast_fn = jax.jit(lambda proj: rasterize(proj, cam.height, cam.width,
                                             bg, cfg))

    proj = proj_fn(g)
    out = rast_fn(proj)
    img = fetch(out.image)

    if args.mode == "ref":
        np.savez(REF, image=img, means2d=fetch(proj.means2d),
                 depth=fetch(proj.depth), radius=fetch(proj.radius),
                 color=fetch(proj.color), opacity=fetch(proj.opacity),
                 valid=fetch(proj.valid))
        print("wrote", REF, "img mean", float(img.mean()))
        return

    if args.mode == "check":
        ref = np.load(REF)
        for name, a in [("means2d", fetch(proj.means2d)),
                        ("depth", fetch(proj.depth)),
                        ("radius", fetch(proj.radius)),
                        ("color", fetch(proj.color)),
                        ("opacity", fetch(proj.opacity))]:
            b = ref[name]
            print(f"{name}: max|diff| {np.abs(a - b).max():.3e}")
        print(f"valid: n_diff {int((fetch(proj.valid) != ref['valid']).sum())}")
        d = np.abs(img - ref["image"])
        print(f"image: max|diff| {d.max():.4f} mean {d.mean():.6f} "
              f"(img mean {img.mean():.4f} ref {ref['image'].mean():.4f})")
        return

    # timing mode: each stage synced via scalar fetch
    def timeit(name, f, n=3):
        f()  # compile+warm
        ts = []
        for _ in range(n):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms")

    timeit("project", lambda: fetch(proj_fn(g).depth[0]))

    # binning (coarse top_k) in isolation
    from v3d_tpu.gs.render import TILE

    n_t = -(-args.res // TILE)
    cf = cfg.coarse_factor
    n_c = -(-n_t // cf)
    ctile = TILE * cf
    Kc = min(cfg.max_per_coarse, args.cap)

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

    timeit("binning_topk", lambda: fetch(binning(proj)[0, 0]))
    timeit("render_fwd", lambda: fetch(rast_fn(proj).image[0, 0, 0]))

    @jax.jit
    def loss_fn(g):
        proj = project_gaussians(g, cam)
        out = rasterize(proj, cam.height, cam.width, bg, cfg)
        return jnp.mean(jnp.abs(out.image - 0.5))

    grad_fn = jax.jit(jax.grad(
        lambda xyz: loss_fn(g._replace(xyz=xyz))))
    timeit("fwd_loss", lambda: fetch(loss_fn(g)))
    timeit("fwd+bwd", lambda: fetch(grad_fn(g.xyz)[0, 0]))


if __name__ == "__main__":
    main()
