"""Wonder3D 6-view ortho-NeuS reconstruction CLI — the runnable counterpart
of mesh_recon/launch.py with configs/neuralangelo-ortho-wmask.yaml +
datasets/ortho.py (the Wonder3D pipeline's mesh stage).

    python -m v3d_tpu.apps.recon_neus_ortho \
        --root wonder3d_outputs/ --object owl --output mesh_out/

Loss recipe = neuralangelo-ortho-wmask.yaml:83-94 (rgb_mse 0.5, mask 1.0,
eikonal 0.2, normal 1.0, 3d-normal-smooth 1.0, sparsity 0.5) with the
per-view weights [1.0, 0.8, 0.2, 1.0, 0.4, 0.7] of config :14.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def reconstruct_ortho(root: str, object_name: str, output: str,
                      max_steps: int = 3000, im_size: int = 512,
                      radius: float = 1.0, num_samples: int = 1024,
                      train_num_rays: int = 256, mc_resolution: int = 256,
                      cam_pose_dir: str = None, seed: int = 0,
                      log_every: int = 100):
    import jax

    from v3d_tpu.data.cameras import get_ortho_ray_directions
    from v3d_tpu.data.wonder3d import load_wonder3d_views
    from v3d_tpu.meshops.mcubes import isosurface
    from v3d_tpu.meshops.mesh import Mesh
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    views = load_wonder3d_views(root, object_name, im_size=im_size,
                                cam_pose_dir=cam_pose_dir)
    t = views["images"].shape[0]
    origins, dirs = get_ortho_ray_directions(im_size, im_size)

    c2ws = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    # ortho.py poses are OpenCV c2w; NeusTrainer expects OpenGL -> flip y/z
    c2ws[:, :3, :4] = views["c2ws"]
    c2ws[:, :, 1:3] *= -1

    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = NeusConfig(
        radius=radius, num_samples_per_ray=num_samples,
        train_num_rays=train_num_rays, max_steps=max_steps,
        # neuralangelo-ortho-wmask.yaml:83-94
        lambda_rgb_mse=0.5, lambda_mask=1.0, lambda_eikonal=0.2,
        lambda_normal=1.0, lambda_3d_normal_smooth=1.0,
        lambda_sparsity=0.5, lambda_distortion=0.0, lambda_opaque=0.0,
        geometry_encoding="frequency" if on_tpu else "hashgrid",
        grad_type="analytic_fwd" if on_tpu else "finite_difference",
        geo_neurons=128 if on_tpu else 64,
        geo_hidden_layers=4 if on_tpu else 1,
        freq_masking_steps=max_steps // 2 if on_tpu else 0,
        use_occ_lookup=not on_tpu,
        ray_chunk=128 if on_tpu else 0)
    trainer = NeusTrainer(
        views["images"], views["masks"], dirs, c2ws,
        normals=views["normals_world"], origins=origins,
        view_weights=views["view_weights"], config=cfg, seed=seed)
    for i in range(max_steps):
        stats = trainer.train_iter()
        if (i + 1) % log_every == 0:
            print(f"step {i+1} " + " ".join(
                f"{k}={v:.4f}" for k, v in stats.items()
                if isinstance(v, float)))

    os.makedirs(output, exist_ok=True)
    import jax.numpy as jnp

    def sdf_fn(pts):
        level_mask = trainer._level_mask()
        out = []
        for s in range(0, len(pts), 262144):
            chunk = jnp.asarray(pts[s:s + 262144])
            out.append(np.asarray(trainer.geometry.apply(
                trainer.params["geometry"], chunk, method="sdf",
                level_mask=level_mask)))
        return np.concatenate(out)

    verts, faces = isosurface(sdf_fn, radius=radius, resolution=mc_resolution,
                              grid_fn=trainer.sdf_grid)
    mesh = Mesh(verts, faces).auto_normal()
    # one jitted chunk program (NeusTrainer.vertex_colors)
    mesh.vertex_colors = trainer.vertex_colors(verts)
    obj_path = os.path.join(output, "mesh.obj")
    mesh.write_obj(obj_path)
    print(f"saved {obj_path} ({len(verts)} verts)")
    return trainer, mesh


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True,
                   help="Wonder3D outputs dir (contains <object>/)")
    p.add_argument("--object", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--max-steps", type=int, default=3000)
    p.add_argument("--im-size", type=int, default=512)
    p.add_argument("--mc-resolution", type=int, default=256)
    p.add_argument("--cam-pose-dir", default=None,
                   help="dir of 000_<view>_RT.txt poses (default: built-in "
                        "Wonder3D fixed poses)")
    args = p.parse_args()
    reconstruct_ortho(args.root, args.object, args.output, args.max_steps,
                      im_size=args.im_size, mc_resolution=args.mc_resolution,
                      cam_pose_dir=args.cam_pose_dir)


if __name__ == "__main__":
    main()
