"""Training loop tests: dataset collate semantics, EMA, LR schedules, and a
few DP train steps on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.data.objaverse import (
    OrbitItemConfig,
    SyntheticOrbitDataset,
    assemble_item,
    video_collate,
)
from v3d_tpu.engines.builder import build_tiny_engine, init_engine_params
from v3d_tpu.engines.ema import ema_decay, ema_update
from v3d_tpu.engines.lr_schedule import lambda_linear, lambda_warmup_cosine
from v3d_tpu.engines.trainer import DiffusionTrainer, TrainConfig
from v3d_tpu.parallel.mesh import make_mesh


def test_assemble_and_collate():
    cfg = OrbitItemConfig(num_frames=4, cond_aug=0.1)
    rng = np.random.RandomState(0)
    lat = rng.randn(4, 8, 8, 4).astype(np.float32)
    item = assemble_item(lat, cfg, rng, is_latent=True)
    assert item["latents"].shape == (4, 8, 8, 4)
    assert item["cond_frames"].shape == (8, 8, 4)
    # cond_frames = front view + noise
    assert not np.allclose(item["cond_frames"], lat[0])
    assert np.abs(item["cond_frames"] - lat[0]).mean() < 0.5

    batch = video_collate([item, item])
    assert batch["latents"].shape == (8, 8, 8, 4)          # (b t) flattened
    assert batch["cond_frames"].shape == (2, 8, 8, 4)      # per video
    assert batch["fps_id"].shape == (8,)
    assert batch["image_only_indicator"].shape == (2, 4)
    assert batch["num_video_frames"] == 4


def test_ema():
    p = {"w": jnp.ones(3)}
    s = {"w": jnp.zeros(3)}
    s2 = ema_update(s, p, step=0, decay=0.9999)
    # warmup decay at step 0 = 0.1 -> shadow moves 90% toward params
    np.testing.assert_allclose(s2["w"], 0.9, rtol=1e-5)
    assert float(ema_decay(10**6)) == pytest.approx(0.9999)


def test_lr_schedules():
    sched = lambda_linear(warm_up_steps=(1,), f_start=(1e-6,), f_max=(1.0,),
                          f_min=(1.0,))
    assert float(sched(0)) == pytest.approx(1e-6)
    assert float(sched(1)) == pytest.approx(1.0, rel=1e-6)
    assert float(sched(10000)) == pytest.approx(1.0, rel=1e-6)
    cos = lambda_warmup_cosine(10, 0.1, 1.0, 0.0, 100)
    assert float(cos(0)) == pytest.approx(0.0)
    assert float(cos(100)) == pytest.approx(0.1, abs=1e-5)


@pytest.mark.slow
def test_diffusion_trainer_steps():
    t = 8
    engine = build_tiny_engine(num_frames=t, resolution=64)
    params = init_engine_params(engine, jax.random.PRNGKey(0), 64, 64)
    ds = SyntheticOrbitDataset(num_objects=4, num_frames=t, latent_hw=8)
    mesh = make_mesh(model=1)
    trainer = DiffusionTrainer(engine, params["unet"],
                               TrainConfig(base_learning_rate=1e-4,
                                           log_every=1),
                               mesh=mesh, num_frames=t)
    losses = []
    it = ds.iter_batches(batch_size=1)
    for i in range(3):
        batch = next(it)
        # tiny engine context dim is 64: fake a clip embedding
        batch["cond_frames_without_noise"] = np.zeros((1, 1, 64), np.float32)
        cond = engine.training_cond(batch, num_frames=t)
        b = trainer.shard_batch({"latents": batch["latents"], "cond": cond})
        stats = trainer.train_step(jax.random.PRNGKey(i), b["latents"],
                                   b["cond"])
        losses.append(stats["loss"])
    assert np.isfinite(losses).all()
    assert trainer.step == 3
    # EMA shadow differs from params but is close
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               trainer.ema_params, trainer.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
