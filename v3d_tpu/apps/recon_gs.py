"""3DGS reconstruction CLI (counterpart of recon/train_from_vid.py).

Reads a generated orbit mp4, fits gaussians on the fixed VideoNVS orbit
(18 cams, radius 2, elevation 0, FOV 60), saves a reference-compatible ply
and optional re-rendered spiral.

    python -m v3d_tpu.apps.recon_gs --video out.mp4 --output scene/
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def train_from_video(video_path: str, output: str, iterations: int = 4000,
                     num_pts: int = 100_000, lambda_dssim: float = 1.0,
                     lambda_lpips: float = 0.0, radius: float = 2.0,
                     elevation: float = 0.0, fov: float = 60.0,
                     white_background: bool = True, test_every: int = 1000,
                     seed: int = 0, opacity_reset_mode: str = "none",
                     opacity_decay: float = 0.995, capacity: int = 300_000):
    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.data.video_io import read_video, write_video
    from v3d_tpu.gs.losses import psnr
    from v3d_tpu.gs.ply import save_ply
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer
    from v3d_tpu.utils.misc import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    frames = read_video(video_path).astype(np.float32) / 255.0
    t, h, w = frames.shape[:3]
    cams = orbit_cameras(t, radius=radius, elevation=elevation, fov_deg=fov,
                         resolution=h, images=list(frames))
    # the shipped recipe is transient-free: per-step opacity decay with NO
    # hard resets — 33.02 dB holdout / 423 s at the reference budget with
    # max probe transient 2.14 dB (quality_refpoint_gs_noreset.json); the
    # reference's reset schedule (train_from_vid.py:170-196) costs ~20 dB
    # shocks and 715 s and stays one flag away
    # (--opacity-reset-mode hard --opacity-decay 1.0)
    cfg = GSTrainConfig(iterations=iterations, lambda_dssim=lambda_dssim,
                        lambda_lpips=lambda_lpips,
                        white_background=white_background,
                        opacity_reset_mode=opacity_reset_mode,
                        opacity_decay=opacity_decay)
    lpips_fn = None
    if lambda_lpips > 0:
        from v3d_tpu.metrics.lpips import load_lpips

        lpips_fn = load_lpips()
    # 100k init -> 300k cap is the reference operating point measured in
    # quality_refpoint_gs_noreset.json (the trainer ctor default is
    # 2*num_pts; the refpoint recipe runs a 3x cap)
    trainer = GSTrainer(cams, cfg, num_pts=num_pts, capacity=capacity,
                        seed=seed, radius=radius, lpips_fn=lpips_fn)
    os.makedirs(output, exist_ok=True)
    # run-reproducibility snapshot (reference utils/callbacks.py:52-95)
    from v3d_tpu.utils.snapshot import snapshot_run

    snapshot_run(output, config=cfg)

    def log_fn(stats):
        out = trainer.render_view(0)
        p = float(psnr(out.image, frames[0]))
        alive = stats.get("num_alive", "-")
        print(f"iter {stats['iter']} loss {float(stats['loss']):.4f} "
              f"psnr {p:.2f} alive {alive}")

    # chunked training: one TPU dispatch per scan chunk (GSTrainer.train)
    trainer.train(iterations, log_every=test_every, log_fn=log_fn)
    ply_path = os.path.join(output, "point_cloud.ply")
    save_ply(ply_path, trainer.gaussians_np())
    print(f"saved {ply_path}")
    # re-render the training orbit (render_spiral.py equivalent)
    renders = np.stack([np.asarray(trainer.render_view(i).image)
                        for i in range(t)])
    write_video(os.path.join(output, "spiral.mp4"),
                (renders * 255).astype(np.uint8), fps=3)
    return trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--iterations", type=int, default=4000)
    p.add_argument("--num-pts", type=int, default=100_000)
    p.add_argument("--lambda-dssim", type=float, default=1.0)
    p.add_argument("--lambda-lpips", type=float, default=0.0)
    p.add_argument("--radius", type=float, default=2.0)
    p.add_argument("--elevation", type=float, default=0.0)
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--opacity-reset-mode", default="none",
                   choices=["none", "hard"],
                   help="'none' (default) = shipped transient-free recipe "
                        "(33.02 dB/423 s at the refpoint); 'hard' = "
                        "reference reset schedule "
                        "(train_from_vid.py:170-196)")
    p.add_argument("--capacity", type=int, default=300_000,
                   help="gaussian slot capacity (densification headroom); "
                        "the refpoint recipe is 100k init -> 300k cap")
    p.add_argument("--opacity-decay", type=float, default=0.995,
                   help="per-step multiplicative opacity decay; the "
                        "floater pressure of the transient-free recipe "
                        "(use 1.0 with --opacity-reset-mode hard for "
                        "reference-faithful behavior)")
    args = p.parse_args()
    train_from_video(args.video, args.output, args.iterations, args.num_pts,
                     args.lambda_dssim, args.lambda_lpips, args.radius,
                     args.elevation, args.fov,
                     opacity_reset_mode=args.opacity_reset_mode,
                     opacity_decay=args.opacity_decay,
                     capacity=args.capacity)


if __name__ == "__main__":
    main()
