"""Iterative diffusion-guided 3DGS refinement (counterpart of
recon/train_iterative.py:82-128).

Every ``resample_period`` iters (after ``resample_start``): render the
current gaussians on the orbit cameras, VAE-encode, perturb with
``sqrt(1 - sigma^2) * z + sigma * eps``, and re-run the diffusion sampler
seeded with that tensor (the reference passes it as the sampler's initial
noise); the regenerated views replace the training images.

    python -m v3d_tpu.apps.recon_gs_iterative --input image.png \
        --checkpoint V3D_512.safetensors --output scene/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def train_iterative(input_image: str, output: str, checkpoint: str = None,
                    iterations: int = 4000, resample_period: int = 500,
                    resample_start: int = 1000, resample_sigma: float = 0.1,
                    num_pts: int = 100_000, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from v3d_tpu.apps.generate import sample_one
    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.gs.ply import save_ply
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    frames, engine, params = sample_one(
        input_image, checkpoint, save=False)
    frames_f = frames.astype(np.float32) / 255.0
    t, h = frames.shape[0], frames.shape[1]
    cams = orbit_cameras(t, resolution=h, images=list(frames_f))
    # transient-free shipped recipe (see apps/recon_gs.py) — resampling
    # perturbs the targets every resample_period anyway, so reset shocks
    # would compound
    trainer = GSTrainer(cams, GSTrainConfig(iterations=iterations,
                                            opacity_reset_mode="none",
                                            opacity_decay=0.995),
                        num_pts=num_pts, seed=seed)
    rng = jax.random.PRNGKey(seed)

    for i in range(iterations):
        trainer.train_iter()
        if i > resample_start and i % resample_period == 0:
            rng, r1, r2, r3 = jax.random.split(rng, 4)
            views = np.stack([np.asarray(trainer.render_view(k).image)
                              for k in range(t)])
            z = engine.encode_first_stage_jit(
                {"encoder": params["encoder"]},
                jnp.asarray(views * 2 - 1), r1) / engine.scale_factor
            noisy = (np.sqrt(1 - resample_sigma**2) * z
                     + jax.random.normal(r2, z.shape) * resample_sigma)
            img = jnp.asarray(frames_f[0:1] * 2 - 1)
            # jitted engine programs with params as ARGUMENTS (the eager
            # path closes the sampler scan over the 1.5B-param pytree and
            # recompiles every call — see engine.sample_latents_jit)
            clip_emb, cond_frames = engine.encode_image_jit(
                {"clip": params["clip"], "encoder": params["encoder"]},
                img, r3, 0.02)
            c, uc = engine.build_cond(clip_emb, cond_frames, 1, 300, 0.02)
            c = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), c)
            uc = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), uc)
            z_new = engine.sample_latents_jit(
                {"unet": params["unet"]}, rng, c, uc,
                jnp.asarray(noisy, jnp.float32))
            new_frames = np.asarray(engine.decode_latents(
                {"decoder": params["decoder"]}, z_new, decoding_t=6))
            trainer.images = jnp.asarray(new_frames)
            print(f"iter {i}: resampled {t} views via diffusion")

    os.makedirs(output, exist_ok=True)
    save_ply(os.path.join(output, "point_cloud.ply"), trainer.gaussians_np())
    return trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--iterations", type=int, default=4000)
    p.add_argument("--resample-period", type=int, default=500)
    p.add_argument("--resample-start", type=int, default=1000)
    p.add_argument("--resample-sigma", type=float, default=0.1)
    args = p.parse_args()
    train_iterative(args.input, args.output, args.checkpoint, args.iterations,
                    args.resample_period, args.resample_start,
                    args.resample_sigma)


if __name__ == "__main__":
    main()
