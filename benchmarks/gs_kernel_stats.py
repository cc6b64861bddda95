"""Instrument the fused Pallas GS compositor at the reference operating point.

Prints per-tile k_stop (early-exit depth chunk) and per-cell live-gaussian
occupancy so kernel optimization targets the real cost distribution, plus
re-times fwd / fwd+bwd as the round-4 baseline.

    python benchmarks/gs_kernel_stats.py --res 512 --pts 100000 --cap 300000
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
from v3d_tpu.gs.render import TILE, RasterizeConfig, project_gaussians, rasterize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--pts", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=300_000)
    ap.add_argument("--kc", type=int, default=4096)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    xyz, colors = random_init_pcd(rng, args.pts, radius=2.0)
    g = from_pcd(xyz, colors, sh_degree=0, capacity=args.cap)
    pose = get_uniform_poses(4, 2.0, 15.0, opengl=False)[1]
    cam = Camera.from_c2w(pose, 60.0, args.res, args.res)
    bg = jnp.ones(3)
    target = jnp.zeros((args.res, args.res, 3)) + 0.5

    n_t = -(-args.res // TILE)
    cf = 8
    n_c = -(-n_t // cf)
    ctile = TILE * cf
    Kc = min(args.kc, args.cap)

    proj = jax.jit(lambda g: project_gaussians(g, cam))(g)

    # per-cell occupancy (live gaussians that survive the coarse bin)
    @jax.jit
    def occupancy(proj):
        gx, gy, r = proj.means2d[:, 0], proj.means2d[:, 1], proj.radius
        depth_masked = jnp.where(proj.valid, proj.depth, jnp.inf)
        cxs = (jnp.arange(n_c * n_c) % n_c).astype(jnp.float32) * ctile
        cys = (jnp.arange(n_c * n_c) // n_c).astype(jnp.float32) * ctile
        ov = ((gx[None] + r[None] >= cxs[:, None])
              & (gx[None] - r[None] <= cxs[:, None] + ctile)
              & (gy[None] + r[None] >= cys[:, None])
              & (gy[None] - r[None] <= cys[:, None] + ctile))
        live = ov & jnp.isfinite(depth_masked)[None]
        return jnp.sum(live, axis=1)

    occ = np.asarray(occupancy(proj))
    print("cell occupancy (live gaussians per coarse cell, cap Kc=%d):" % Kc)
    print("  ", occ.reshape(n_c, n_c))

    # k_stop per tile from the fused kernel's diagnostic row
    from v3d_tpu.gs.render import _make_pallas_composite  # noqa: PLC2701

    cfg = RasterizeConfig(max_per_tile=256, tile_chunk=32, coarse_factor=cf,
                          max_per_coarse=args.kc, backend="pallas")

    # rebuild enough of rasterize() to reach the raw fused-kernel output
    from v3d_tpu.gs.pallas_raster import D as PD
    from v3d_tpu.gs.pallas_raster import composite_tiles_fwd

    @jax.jit
    def raw_out(proj):
        depth_masked = jnp.where(proj.valid, proj.depth, jnp.inf)
        op_eff = jnp.where(proj.valid, proj.opacity, 0.0)
        packed = jnp.concatenate([
            proj.means2d, proj.conic, proj.color, op_eff[:, None],
            proj.depth[:, None]], axis=1)
        gx, gy, r = proj.means2d[:, 0], proj.means2d[:, 1], proj.radius
        cxs = (jnp.arange(n_c * n_c) % n_c).astype(jnp.float32) * ctile
        cys = (jnp.arange(n_c * n_c) // n_c).astype(jnp.float32) * ctile
        ov = ((gx[None] + r[None] >= cxs[:, None])
              & (gx[None] - r[None] <= cxs[:, None] + ctile)
              & (gy[None] + r[None] >= cys[:, None])
              & (gy[None] - r[None] <= cys[:, None] + ctile))
        score = jnp.where(ov, depth_masked[None], jnp.inf)
        neg, idx = jax.lax.top_k(-score, Kc)
        ok = jnp.isfinite(neg)
        slab = jnp.where(ok[..., None], packed[idx], 0.0)
        kpad = (-Kc) % PD
        if kpad:
            slab = jnp.concatenate(
                [slab, jnp.zeros((slab.shape[0], kpad, 10))], axis=1)
        slab_am = jnp.pad(jnp.transpose(slab, (0, 2, 1)),
                          ((0, 0), (0, 6), (0, 0)))
        tx = np.arange(n_t * n_t) % n_t
        ty = np.arange(n_t * n_t) // n_t
        cell_np = ((ty // cf) * n_c + tx // cf).astype(np.int32)
        xy_np = np.stack([tx * TILE, ty * TILE], -1).astype(np.int32)
        live = jnp.sum(ok, axis=1).astype(jnp.int32)
        return composite_tiles_fwd(slab_am, cell_np, xy_np,
                                   live_count=live)[0]

    out = np.asarray(raw_out(proj))
    k_stop = out[:, 6, 0]
    n_chunks = (Kc + (-Kc) % PD) // PD
    print(f"k_stop per tile (of {n_chunks} chunks): "
          f"min {k_stop.min():.0f} p50 {np.median(k_stop):.0f} "
          f"mean {k_stop.mean():.1f} p95 {np.percentile(k_stop, 95):.0f} "
          f"max {k_stop.max():.0f}")
    hist = np.histogram(k_stop, bins=[0, 1, 2, 4, 8, 16, 24, 32, 64])
    print("k_stop histogram:", list(zip(hist[1][:-1].tolist(),
                                        hist[0].tolist())))
    total_chunk_steps = int(k_stop.sum())
    print(f"total fwd chunk-steps executed: {total_chunk_steps} "
          f"(dense would be {len(k_stop) * n_chunks})")

    # baseline timings (same config as gs_backend_bench round 3)
    def timeit(name, f, n=3):
        f()
        ts = []
        for _ in range(n):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        ms = min(ts) * 1e3
        print(f"{name}: {ms:.1f} ms", flush=True)
        return ms

    rast = jax.jit(lambda p: rasterize(p, cam.height, cam.width, bg, cfg))
    fwd_ms = timeit("render_fwd[pallas]",
                    lambda: np.asarray(rast(proj).image[0, 0, 0]))

    def loss_fn(xyz):
        p = project_gaussians(g._replace(xyz=xyz), cam)
        out = rasterize(p, cam.height, cam.width, bg, cfg)
        return jnp.mean(jnp.abs(out.image - target))

    gf = jax.jit(jax.grad(loss_fn))
    bwd_ms = timeit("fwd_bwd[pallas]", lambda: np.asarray(gf(g.xyz)[0, 0]))

    res = {"occ": occ.tolist(), "k_stop_sum": total_chunk_steps,
           "k_stop_p50": float(np.median(k_stop)),
           "k_stop_mean": float(k_stop.mean()),
           "fwd_ms": fwd_ms, "fwd_bwd_ms": bwd_ms,
           "res": args.res, "pts": args.pts, "cap": args.cap, "kc": args.kc}
    if args.tag:
        path = os.path.join(_repo, "benchmarks", "results",
                            f"gs_kernel_stats_{args.tag}.json")
        from benchmarks._io import write_json
        write_json(path, res)


if __name__ == "__main__":
    main()
