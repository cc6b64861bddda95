"""Scene reconstruction CLI (counterparts: recon/train_scene.py for 3DGS on
posed captures; mesh_recon/systems/neus_pinhole.py + datasets/
videonvs_co3d.py:212 for pinhole-scene NeuS).

Fits 3DGS or NeuS to a posed multi-view scene instead of the fixed V3D
orbit.  Supported layouts: blender/videonvs ``transforms_*.json``, a COLMAP
workspace, DTU ``cameras.npz``, or a CO3D category/sequence dir.

    python -m v3d_tpu.apps.recon_scene --scene data/lego --format blender \
        --method gs --output out/
    python -m v3d_tpu.apps.recon_scene --scene co3d/ --format co3d \
        --category hydrant --method neus --output out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_scene(args):
    from v3d_tpu.data import scene_datasets as sd

    if args.format == "blender":
        return sd.load_blender_scene(args.scene, args.split)
    if args.format == "videonvs":
        return sd.load_videonvs_scene(args.scene)
    if args.format == "colmap":
        return sd.load_colmap_scene(args.scene)
    if args.format == "dtu":
        return sd.load_dtu_scene(args.scene)
    if args.format == "co3d":
        return sd.load_co3d_scene(args.scene, args.category, args.sequence,
                                  reso=args.reso, num_frames=args.num_frames)
    raise SystemExit(f"unknown scene format: {args.format}")


def scene_cameras(scene):
    """SceneFrames -> 3DGS Cameras: per-frame FoV from K (the principal
    point is assumed centered — true for blender/videonvs renders and the
    box-cropped CO3D frames; dataset_readers.py:458-477)."""
    import math

    from v3d_tpu.data.cameras import Camera

    cams = []
    h, w = scene.images.shape[1:3]
    for i in range(scene.num_frames):
        c2w = scene.c2ws[i].copy()
        if scene.opengl:
            c2w[:, 1:3] *= -1  # OpenGL -> OpenCV for the GS camera stack
        fov_deg = math.degrees(2 * math.atan(w / (2 * scene.intrinsics[i][0, 0])))
        img = scene.images[i]
        if scene.fg_masks is not None:
            # composite to white like the orbit pipeline (train_from_vid)
            m = scene.fg_masks[i][..., None]
            img = img * m + (1 - m)
        cams.append(Camera.from_c2w(c2w, fov_deg, w, h, image=img))
    return cams


def run_gs(scene, args):
    from v3d_tpu.gs.losses import psnr
    from v3d_tpu.gs.ply import save_ply
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    cams = scene_cameras(scene)
    # transient-free shipped recipe by default (see apps/recon_gs.py);
    # reference reset semantics one flag away
    cfg = GSTrainConfig(iterations=args.iterations,
                        lambda_dssim=args.lambda_dssim,
                        max_per_coarse=args.kc,
                        max_per_tile=getattr(args, "max_per_tile", 256),
                        tile_chunk=getattr(args, "tile_chunk", 32),
                        opacity_reset_mode=getattr(
                            args, "opacity_reset_mode", "none"),
                        opacity_decay=getattr(args, "opacity_decay", 0.995))
    trainer = GSTrainer(cams, cfg, num_pts=args.num_pts, seed=args.seed,
                        radius=args.init_radius)

    def log_fn(stats):
        out = trainer.render_view(0)
        p = float(psnr(out.image, cams[0].image))
        print(f"iter {stats['iter']} loss {float(stats['loss']):.4f} "
              f"psnr {p:.2f}", flush=True)

    trainer.train(args.iterations, log_every=args.log_every, log_fn=log_fn)
    os.makedirs(args.output, exist_ok=True)
    ply_path = os.path.join(args.output, "point_cloud.ply")
    save_ply(ply_path, trainer.gaussians_np())
    print(f"saved {ply_path}")
    return trainer


def run_neus(scene, args):
    """Pinhole NeuS: per-frame ray directions from each K
    (neus_pinhole.py:89-94 directions.ndim == 4 branch)."""
    from v3d_tpu.data.cameras import get_ray_directions
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    h, w = scene.images.shape[1:3]
    Ks = scene.intrinsics
    shared = np.allclose(Ks, Ks[:1], atol=1e-4)
    if shared:
        dirs = get_ray_directions(h, w, float(Ks[0][0, 0]),
                                  (float(Ks[0][0, 2]), float(Ks[0][1, 2])))
    else:
        dirs = np.stack([
            get_ray_directions(h, w, float(K[0, 0]),
                               (float(K[0, 2]), float(K[1, 2])))
            for K in Ks])
    masks = (scene.fg_masks if scene.fg_masks is not None
             else np.ones(scene.images.shape[:3], np.float32))
    import jax as _jax
    on_tpu = _jax.default_backend() in ("tpu", "axon")
    cfg = NeusConfig(
        max_steps=args.iterations,
        geometry_encoding="frequency", grad_type="analytic_fwd",
        dynamic_ray_sampling=False,
        train_num_rays=args.rays, max_train_num_rays=args.rays,
        use_occ_lookup=False, lambda_normal=0.0,
        # coarse-to-fine empty-space skipping at a quarter fine budget:
        # 4.1x faster at unchanged PSNR (neus_c2f_r4.json; r3 task 4)
        coarse_to_fine_samples=64 if on_tpu else 0,
        num_samples_per_ray=256 if on_tpu else 1024,
        ray_chunk=min(args.rays, 128),
        learned_background=scene.fg_masks is None,
        lambda_mask=1.0 if scene.fg_masks is not None else 0.0,
        background_color="white")
    trainer = NeusTrainer(scene.images, masks, dirs, scene.c2ws,
                          config=cfg, seed=args.seed)
    for start in range(0, args.iterations, args.log_every):
        n = min(args.log_every, args.iterations - start)
        stats = trainer.train(n, chunk=min(50, n))
        print(f"step {trainer.global_step} loss {float(stats['loss']):.4f}",
              flush=True)
    os.makedirs(args.output, exist_ok=True)
    from v3d_tpu.meshops.mcubes import isosurface
    from v3d_tpu.meshops.mesh import Mesh

    def sdf_fn(pts):
        import jax.numpy as jnp

        level_mask = trainer._level_mask()
        out = []
        for s in range(0, len(pts), 262144):
            chunk = jnp.asarray(pts[s:s + 262144])
            out.append(np.asarray(trainer.geometry.apply(
                trainer.params["geometry"], chunk, method="sdf",
                level_mask=level_mask)))
        return np.concatenate(out)

    verts, faces = isosurface(sdf_fn, radius=cfg.radius,
                              resolution=args.mc_resolution,
                              grid_fn=trainer.sdf_grid)
    mesh = Mesh(verts, faces).auto_normal()
    obj_path = os.path.join(args.output, "mesh.obj")
    mesh.write_obj(obj_path)
    print(f"saved {obj_path} ({len(verts)} verts, {len(faces)} faces)")
    return trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--format", default="blender",
                   choices=["blender", "videonvs", "colmap", "dtu", "co3d"])
    p.add_argument("--method", default="gs", choices=["gs", "neus"])
    p.add_argument("--split", default="train")
    p.add_argument("--category", default="hydrant")
    p.add_argument("--sequence", default=None)
    p.add_argument("--reso", type=int, default=256)
    p.add_argument("--num-frames", type=int, default=0)
    p.add_argument("--iterations", type=int, default=4000)
    p.add_argument("--num-pts", type=int, default=100_000)
    p.add_argument("--init-radius", type=float, default=1.5)
    p.add_argument("--lambda-dssim", type=float, default=0.2)
    p.add_argument("--kc", type=int, default=4096)
    p.add_argument("--max-per-tile", type=int, default=256,
                   help="per-tile depth-slab size of the GS rasterizer")
    p.add_argument("--tile-chunk", type=int, default=32)
    p.add_argument("--rays", type=int, default=256)
    p.add_argument("--mc-resolution", type=int, default=128)
    p.add_argument("--opacity-reset-mode", default="none",
                   choices=["none", "hard"],
                   help="'none' (default) = transient-free recipe; 'hard' "
                        "= reference reset schedule")
    p.add_argument("--opacity-decay", type=float, default=0.995)
    p.add_argument("--log-every", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    scene = load_scene(args)
    print(f"scene: {scene.num_frames} frames "
          f"{scene.images.shape[1]}x{scene.images.shape[2]}")
    if args.method == "gs":
        run_gs(scene, args)
    else:
        run_neus(scene, args)


if __name__ == "__main__":
    main()
