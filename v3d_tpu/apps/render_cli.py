"""Re-render a trained 3DGS scene (counterparts of recon/render_spiral.py,
render.py, render_depth.py): load a point_cloud.ply, render the orbit (or an
interpolated smooth path) as rgb/depth videos.

    python -m v3d_tpu.apps.render_cli --ply scene/point_cloud.ply \
        --output renders/ [--mode spiral|orbit|depth]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_scene(ply_path: str, output: str, mode: str = "spiral",
                 num_frames: int = 60, resolution: int = 512,
                 radius: float = 2.0, elevation: float = 0.0,
                 fov: float = 60.0, white_background: bool = True):
    import jax.numpy as jnp

    from v3d_tpu.data.cam_paths import get_interpolated_path
    from v3d_tpu.data.cameras import Camera, get_uniform_poses
    from v3d_tpu.data.video_io import write_video
    from v3d_tpu.gs.gaussians import GaussianParams
    from v3d_tpu.gs.ply import load_ply
    from v3d_tpu.gs.render import render

    g_np = load_ply(ply_path)
    g = GaussianParams(**{k: jnp.asarray(v) for k, v in g_np.items()})
    if mode == "spiral":
        base = get_uniform_poses(18, radius, elevation)
        poses = get_interpolated_path(base, max(1, num_frames // 18))
    else:
        poses = get_uniform_poses(num_frames, radius, elevation)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    rgbs, depths = [], []
    # "points" mode = render with scaling_modifier 0.1 (gaussians shrunk
    # to dots, recon/render_points.py:31)
    scaling_mod = 0.1 if mode == "points" else 1.0
    for pose in poses:
        cam = Camera.from_c2w(pose, fov, resolution, resolution)
        out = render(g, cam, bg, active_sh_degree=g.sh_degree,
                     scaling_modifier=scaling_mod)
        rgbs.append(np.asarray(out.image))
        depths.append(np.asarray(out.depth))
    os.makedirs(output, exist_ok=True)
    write_video(os.path.join(output, f"{mode}.mp4"),
                (np.clip(np.stack(rgbs), 0, 1) * 255).astype(np.uint8), fps=10)
    if mode == "depth":
        from v3d_tpu.utils.colormaps import apply_depth_colormap

        d = np.stack(depths)
        dc = np.stack([apply_depth_colormap(f) for f in d])
        write_video(os.path.join(output, "depth.mp4"),
                    (dc * 255).astype(np.uint8), fps=10)
    print(f"rendered {len(poses)} views to {output}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ply", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="spiral",
                   choices=["spiral", "orbit", "depth", "points"])
    p.add_argument("--num-frames", type=int, default=60)
    p.add_argument("--resolution", type=int, default=512)
    args = p.parse_args()
    render_scene(args.ply, args.output, args.mode, args.num_frames,
                 args.resolution)


if __name__ == "__main__":
    main()


def export_blender_cameras(output: str, num_frames: int = 18,
                           radius: float = 2.0, elevation: float = 0.0,
                           fov_deg: float = 60.0):
    """recon/convert_to_blender.py equivalent: write a transforms.json with
    the orbit cameras (OpenGL convention) for external tooling."""
    import json

    import numpy as np

    from v3d_tpu.data.cameras import get_uniform_poses

    poses = get_uniform_poses(num_frames, radius, elevation, opengl=True)
    meta = {
        "camera_angle_x": float(np.deg2rad(fov_deg)),
        "frames": [{"file_path": f"r_{i}",
                    "transform_matrix": poses[i].tolist()}
                   for i in range(num_frames)],
    }
    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, "transforms.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    return path
