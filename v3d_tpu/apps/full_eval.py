"""Batch 3DGS evaluation driver (counterpart of recon/full_eval.py): for each
scene video, train -> render -> metrics, collecting a summary table.

    python -m v3d_tpu.apps.full_eval --videos a.mp4 b.mp4 --output eval_out/
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def run(videos, output: str, iterations: int = 4000):
    import jax.numpy as jnp

    from v3d_tpu.apps.recon_gs import train_from_video
    from v3d_tpu.data.video_io import read_video
    from v3d_tpu.gs.losses import psnr, ssim

    results = {}
    for vid in videos:
        name = os.path.splitext(os.path.basename(vid))[0]
        out_dir = os.path.join(output, name)
        trainer = train_from_video(vid, out_dir, iterations=iterations)
        frames = read_video(vid).astype(np.float32) / 255.0
        ps, ss = [], []
        for i in range(len(frames)):
            img = np.asarray(trainer.render_view(i).image)
            ps.append(float(psnr(jnp.asarray(img), jnp.asarray(frames[i]))))
            ss.append(float(ssim(jnp.asarray(img), jnp.asarray(frames[i]))))
        results[name] = {"psnr": float(np.mean(ps)),
                         "ssim": float(np.mean(ss))}
        print(name, results[name])
    with open(os.path.join(output, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--videos", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--iterations", type=int, default=4000)
    args = p.parse_args()
    run(args.videos, args.output, args.iterations)


if __name__ == "__main__":
    main()
