"""Offline metrics CLI (counterpart of recon/metrics.py): PSNR/SSIM (+LPIPS
when weights available) between a directory of renders and ground truth.

    python -m v3d_tpu.apps.metrics_cli --renders out/ --gt gt/
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def evaluate(renders_dir: str, gt_dir: str) -> dict:
    import jax.numpy as jnp
    from PIL import Image

    from v3d_tpu.gs.losses import psnr, ssim
    from v3d_tpu.metrics.lpips import load_lpips

    lpips_fn = load_lpips()
    names = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(renders_dir, "*.png")))
    scores = {"psnr": [], "ssim": [], "lpips": []}
    for name in names:
        r = np.asarray(Image.open(os.path.join(renders_dir, name)).convert(
            "RGB"), np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, name)).convert(
            "RGB"), np.float32) / 255.0
        scores["psnr"].append(float(psnr(jnp.asarray(r), jnp.asarray(g))))
        scores["ssim"].append(float(ssim(jnp.asarray(r), jnp.asarray(g))))
        if lpips_fn is not None:
            scores["lpips"].append(float(lpips_fn(jnp.asarray(r)[None],
                                                  jnp.asarray(g)[None])))
    out = {k: float(np.mean(v)) for k, v in scores.items() if v}
    out["n_images"] = len(names)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--renders", required=True)
    p.add_argument("--gt", required=True)
    args = p.parse_args()
    print(json.dumps(evaluate(args.renders, args.gt), indent=2))


if __name__ == "__main__":
    main()
