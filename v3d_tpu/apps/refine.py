"""Texture refinement CLI (counterpart of mesh_recon/refine.py do_refine).

    python -m v3d_tpu.apps.refine --mesh mesh.obj --video out.mp4 \
        --output refined/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def do_refine(mesh_path: str, video_path: str, output: str,
              iters: int = 2000, num_opt_views: int = 16,
              lambda_lpips: float = 0.0, lr: float = 1e-3):
    from v3d_tpu.data.video_io import read_video, write_video
    from v3d_tpu.meshops.mesh import Mesh
    from v3d_tpu.meshops.refine import RefineConfig, TextureRefiner

    mesh = Mesh.read_obj(mesh_path)
    frames = read_video(video_path).astype(np.float32) / 255.0
    lpips_fn = None
    if lambda_lpips > 0:
        from v3d_tpu.metrics.lpips import load_lpips

        lpips_fn = load_lpips()
    cfg = RefineConfig(iters=iters, num_opt_views=num_opt_views,
                       lambda_lpips=lambda_lpips, lr=lr)
    refiner = TextureRefiner(mesh, frames, cfg, lpips_fn=lpips_fn)
    losses = refiner.run()
    print(f"refined {iters} iters, loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    os.makedirs(output, exist_ok=True)
    out = refiner.export()
    out.write_obj(os.path.join(output, "refined.obj"))
    out.write_glb(os.path.join(output, "refined.glb"))
    # orbit re-render (refine.py:221-246 render_spiral)
    import jax

    renders = []
    for i in range(len(frames)):
        img, _ = jax.jit(refiner.render)(refiner.logits, i)
        renders.append(np.asarray(img))
    write_video(os.path.join(output, "refined_spiral.mp4"),
                (np.stack(renders) * 255).astype(np.uint8), fps=3)
    print(f"saved refined mesh + spiral to {output}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mesh", required=True)
    p.add_argument("--video", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--num-opt-views", type=int, default=16)
    p.add_argument("--lambda-lpips", type=float, default=0.0)
    args = p.parse_args()
    do_refine(args.mesh, args.video, args.output, args.iters,
              args.num_opt_views, args.lambda_lpips)


if __name__ == "__main__":
    main()
