"""Generation CLI (counterpart of scripts/pub/V3D_512.py sample_one).

image -> preprocess (matting + recenter + white composite) -> CLIP/VAE
conditioning -> EDM sampling of the VideoUNet -> temporal VAE decode ->
18-frame orbit mp4.

    python -m v3d_tpu.apps.generate --input image.png \
        --checkpoint ckpts/V3D_512.safetensors --output-folder outputs/
"""

from __future__ import annotations

import argparse
import os
import time
from glob import glob
from typing import Optional

import numpy as np


def sample_one(input_path: str, checkpoint_path: Optional[str] = None,
               num_frames: int = 18, num_steps: int = 25,
               fps_id: int = 1, motion_bucket_id: int = 300,
               cond_aug: float = 0.02, seed: int = 23,
               decoding_t: int = 18, border_ratio: float = 0.3,
               min_guidance_scale: float = 3.5,
               max_guidance_scale: float = 3.5,
               sigma_max: float = 700.0,
               output_folder: str = "outputs/v3d_512",
               save: bool = True, ignore_alpha: bool = False,
               bf16: bool = True, engine=None, params=None):
    """Returns (frames uint8 (T, 512, 512, 3), engine, params)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from v3d_tpu.data.preprocess import preprocess_image
    from v3d_tpu.data.video_io import write_video
    from v3d_tpu.engines.builder import build_v3d_engine, init_engine_params
    from v3d_tpu.utils.misc import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    if engine is None:
        engine = build_v3d_engine(
            num_frames=num_frames, num_steps=num_steps,
            min_scale=min_guidance_scale, max_scale=max_guidance_scale,
            sigma_max=sigma_max, dtype=jnp.bfloat16 if bf16 else None)
    if params is None:
        if checkpoint_path:
            from v3d_tpu.core.checkpoint import load_v3d_params
            from v3d_tpu.utils.params import cast_params

            params = load_v3d_params(checkpoint_path)
            if bf16:
                # bf16-resident weights: required to fit + run fast on one
                # 16GB chip (see utils/params.py)
                params = cast_params(params)
        else:
            print("WARNING: no checkpoint given — using random weights "
                  "(output will be noise; for pipeline testing only)")
            from v3d_tpu.utils.params import cast_params

            # ONE jitted program (eager flax init dispatches one tunnel
            # round-trip per param — minutes for the 1.5B-param UNet) with
            # the bf16 cast fused in: an f32-resident random init OOMs the
            # 16GB chip once the bf16 working copies join it (see
            # utils/params.py; this exact failure was RESOURCE_EXHAUSTED
            # in the first full_asset run).
            def _init(rng):
                p = init_engine_params(engine, rng, 512, 512)
                return cast_params(p) if bf16 else p

            params = jax.jit(_init)(jax.random.PRNGKey(0))

    img = np.asarray(Image.open(input_path))
    image = preprocess_image(img, border_ratio=border_ratio, resolution=512,
                             ignore_alpha=ignore_alpha)[None]

    rng = jax.random.PRNGKey(seed)
    r_enc, r_samp = jax.random.split(rng)
    t0 = time.time()
    # Jitted conditioning program (eager CLIP+VAE encode is hundreds of
    # ~50 ms tunnel dispatches); pass only the subtrees each program reads
    # so the compiled signatures (and persistent-cache entries) match
    # bench.py's exactly.
    clip_emb, cond_frames = engine.encode_image_jit(
        {"clip": params["clip"], "encoder": params["encoder"]},
        jnp.asarray(image), r_enc, cond_aug)
    c, uc = engine.build_cond(clip_emb, cond_frames, fps_id,
                              motion_bucket_id, cond_aug)
    # f32 cond operands = the program bench.py compiles/caches (the UNet
    # casts to its working dtype internally)
    c = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), c)
    uc = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), uc)
    t_enc = time.time() - t0

    # Precompute noise exactly as sample_latents would (split -> normal) so
    # semantics match the eager path while the jitted program takes noise
    # as an operand (bench.py signature).
    r_noise, _ = jax.random.split(r_samp)
    noise = jax.random.normal(r_noise, engine.latent_shape(512, 512))
    t0s = time.time()
    z = engine.sample_latents_jit({"unet": params["unet"]}, r_samp, c, uc,
                                  noise)
    np.asarray(z[0, 0, 0, 0])  # scalar host fetch: the honest sync (CLAUDE.md)
    t_samp = time.time() - t0s
    t0d = time.time()
    frames = engine.decode_latents({"decoder": params["decoder"]}, z,
                                   decoding_t=decoding_t)
    # u8 on-device: fetching f32 frames is 56 MB over the ~110 MB/s tunnel,
    # u8 is 14 MB
    frames_u8 = np.asarray(
        jnp.round(frames * 255.0).astype(jnp.uint8))
    t_dec = time.time() - t0d
    print(f"generated {len(frames_u8)} frames in {time.time() - t0:.1f}s "
          f"(cond {t_enc:.1f}s, sample {t_samp:.1f}s, "
          f"decode+fetch {t_dec:.1f}s)")
    if save:
        os.makedirs(output_folder, exist_ok=True)
        base = len(glob(os.path.join(output_folder, "*.mp4")))
        path = os.path.join(output_folder, f"{base:06d}.mp4")
        write_video(path, frames_u8, fps=3)
        print(f"wrote {path}")
    return frames_u8, engine, params


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--num-steps", type=int, default=25)
    p.add_argument("--num-frames", type=int, default=18)
    p.add_argument("--fps-id", type=int, default=1)
    p.add_argument("--motion-bucket-id", type=int, default=300)
    p.add_argument("--cond-aug", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--decoding-t", type=int, default=6)
    p.add_argument("--border-ratio", type=float, default=0.3)
    p.add_argument("--min-cfg", type=float, default=3.5)
    p.add_argument("--max-cfg", type=float, default=3.5)
    p.add_argument("--sigma-max", type=float, default=700.0)
    p.add_argument("--output-folder", default="outputs/v3d_512")
    p.add_argument("--ignore-alpha", action="store_true")
    args = p.parse_args()
    sample_one(args.input, args.checkpoint, args.num_frames, args.num_steps,
               args.fps_id, args.motion_bucket_id, args.cond_aug, args.seed,
               args.decoding_t, args.border_ratio, args.min_cfg, args.max_cfg,
               args.sigma_max, args.output_folder,
               ignore_alpha=args.ignore_alpha)


if __name__ == "__main__":
    main()
