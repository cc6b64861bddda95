"""A/B the NeuS mesh-export SDF-grid evaluation on the attached chip.

Old path: isosurface builds host grids and sdf_fn uploads them in 262144-pt
eager chunks (at 384^3: ~680 MB of coordinates through the ~110 MB/s tunnel
over 216 dispatches).  New path: NeusTrainer.sdf_grid generates the grid
ON DEVICE inside one jitted lax.map program; the only transfer is the
(res^3) f32 result fetch.

Trains a few warmup steps on a synthetic ball (sphere-init SDF guarantees a
zero crossing) at the production recon_neus sizing, then times BOTH paths
at the reference's 384^3 export budget.  Writes
benchmarks/results/neus_export_r5.json.
"""

import json
import os
import sys
import time

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp

os.makedirs(os.path.join(repo, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.meshops.mcubes import isosurface
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    t, res = 18, 512
    poses = get_uniform_poses(t, 2.0, 0.0, opengl=True)
    focal = res / (2 * np.tan(np.deg2rad(30)))
    dirs = get_ray_directions(res, res, focal)
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 5) ** 2)
    images = np.tile(
        np.repeat(mask[None, :, :, None], t, 0).astype(np.float32),
        (1, 1, 1, 3)) * 0.8
    fg = np.repeat(mask[None], t, 0).astype(np.float32)

    # recon_neus TPU production config (apps/recon_neus.py:87-100)
    cfg = NeusConfig(radius=1.0, num_samples_per_ray=256,
                     coarse_to_fine_samples=64, train_num_rays=256,
                     max_steps=100, lambda_normal=0.0,
                     geometry_encoding="frequency",
                     grad_type="analytic_fwd", geo_neurons=128,
                     geo_hidden_layers=4, freq_masking_steps=50,
                     use_occ_lookup=False, ray_chunk=128)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg, seed=0)
    t0 = time.time()
    trainer.train(100, log_every=0)
    print(f"warmup train 100 steps: {time.time() - t0:.1f}s", flush=True)

    def sdf_fn(pts):  # the pre-r5 recon_neus chunk loop, verbatim
        level_mask = trainer._level_mask()
        out = []
        for s in range(0, len(pts), 262144):
            chunk = jnp.asarray(pts[s:s + 262144])
            out.append(np.asarray(trainer.geometry.apply(
                trainer.params["geometry"], chunk, method="sdf",
                level_mask=level_mask)))
        return np.concatenate(out)

    rows = {}
    mc = 384
    t0 = time.time()
    v_new, f_new = isosurface(None, radius=1.0, resolution=mc,
                              grid_fn=trainer.sdf_grid)
    rows["grid_fn_cold_s"] = round(time.time() - t0, 2)  # incl. 2 compiles
    t0 = time.time()
    v_new, f_new = isosurface(None, radius=1.0, resolution=mc,
                              grid_fn=trainer.sdf_grid)
    rows["grid_fn_warm_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    v_old, f_old = isosurface(sdf_fn, radius=1.0, resolution=mc)
    rows["host_chunks_s"] = round(time.time() - t0, 2)
    # The two paths differ by f32 coordinate rounding (host linspace vs
    # on-device lo + i*step): SDF values agree to ~2e-5
    # (tests/test_neus.py::test_sdf_grid_matches_host_chunk_path) but a
    # handful of near-zero cells flip sign, so vertex COUNTS may differ by
    # a few.  Report count delta + a sampled nearest-vertex distance
    # instead of exact equality.
    rows["n_verts_old"] = int(len(v_old))
    rows["n_verts_new"] = int(len(v_new))
    sel = np.random.RandomState(0).choice(
        len(v_new), size=min(2000, len(v_new)), replace=False)
    d = np.array([np.min(np.linalg.norm(v_old - v, axis=1))
                  for v in v_new[sel]])
    rows["sampled_nn_dist_p99"] = float(np.percentile(d, 99))
    rows["mc_resolution"] = mc
    print(json.dumps(rows), flush=True)
    from benchmarks._io import write_json
    write_json(os.path.join(repo, "benchmarks", "results",
                            "neus_export_r5.json"), rows)


if __name__ == "__main__":
    main()
