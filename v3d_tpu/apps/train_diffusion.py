"""Video-diffusion fine-tuning CLI (the training launcher the reference
lacks — SURVEY §2.10; wiring equivalent to DiffusionEngine.training_step +
Lightning DDP, here DP over a jax.sharding Mesh).

    python -m v3d_tpu.apps.train_diffusion --data /path/to/orbit_renders \
        --checkpoint svd_xt.safetensors --batch-size 1 --max-steps 10000
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True,
                   help="root of per-object orbit render dirs "
                        "(data.objaverse.OrbitRenderDataset layout); "
                        "'synthetic' for a throughput smoke run")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-frames", type=int, default=18)
    p.add_argument("--max-steps", type=int, default=100_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ckpt-dir", default="ckpts_out")
    p.add_argument("--ckpt-every", type=int, default=5000)
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--model-axis", type=int, default=1,
                   help="TP axis size of the device mesh")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from v3d_tpu.data.objaverse import (
        OrbitItemConfig,
        OrbitRenderDataset,
        SyntheticOrbitDataset,
    )
    from v3d_tpu.engines.builder import build_v3d_engine, init_engine_params
    from v3d_tpu.engines.trainer import DiffusionTrainer, TrainConfig
    from v3d_tpu.parallel.mesh import make_mesh
    from v3d_tpu.utils.logging import ExperimentLogger

    engine = build_v3d_engine(num_frames=args.num_frames, dtype=jnp.bfloat16)
    if args.checkpoint:
        from v3d_tpu.core.checkpoint import load_v3d_params

        params = load_v3d_params(args.checkpoint)
    else:
        print("WARNING: training from random init (no checkpoint)")
        params = init_engine_params(engine, jax.random.PRNGKey(0), 512, 512)

    mesh = make_mesh(model=args.model_axis)
    trainer = DiffusionTrainer(
        engine, params["unet"],
        TrainConfig(base_learning_rate=args.lr, max_steps=args.max_steps,
                    ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every),
        mesh=mesh, num_frames=args.num_frames)
    logger = ExperimentLogger(args.log_dir)
    # run-reproducibility snapshot (reference utils/callbacks.py:52-95)
    from v3d_tpu.utils.snapshot import snapshot_run

    snapshot_run(args.log_dir, config=vars(args))

    if args.data == "synthetic":
        ds = SyntheticOrbitDataset(num_objects=64,
                                   num_frames=args.num_frames)
    else:
        ds = OrbitRenderDataset(args.data,
                                OrbitItemConfig(num_frames=args.num_frames))

    def batches():
        rng = jax.random.PRNGKey(1)
        for batch in ds.iter_batches(args.batch_size):
            rng, sub = jax.random.split(rng)
            if "latents" not in batch:
                frames = jnp.asarray(batch["frames"])
                batch["latents"] = np.asarray(
                    engine.encode_first_stage(params, frames, sub))
                batch["cond_frames"] = np.asarray(engine.encode_first_stage(
                    params, jnp.asarray(batch["cond_frames"]), sub))
            if batch["cond_frames_without_noise"].ndim != 3:
                from v3d_tpu.models.clip_vit import clip_preprocess

                emb = engine.clip.apply(
                    params["clip"], clip_preprocess(
                        jnp.asarray(batch["cond_frames_without_noise"])))
                batch["cond_frames_without_noise"] = np.asarray(emb)[:, None]
            cond = engine.training_cond(batch, num_frames=args.num_frames)
            yield {"latents": jnp.asarray(batch["latents"]), "cond": cond}

    trainer.fit(batches(), log_fn=lambda s: logger.log(s, s.get("step")),
                prefetch=True)


if __name__ == "__main__":
    main()
