"""Diffusion fine-tuning loop (the training launcher).

The reference wires everything for training (DiffusionEngine.training_step,
video_diffusion.py:240-361) but ships no launcher (SURVEY.md §2.10); this is
the TPU-native one: a pjit DP train step over a jax.sharding Mesh (grad
all-reduce rides ICI via the sharded-batch jit), AdamW + LambdaLinear
schedule, EMA shadow params, periodic orbax checkpoints.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from v3d_tpu.core.checkpoint import (
    latest_checkpoint,
    load_pytree,
    prune_checkpoints,
    save_pytree,
)
from v3d_tpu.engines.ema import ema_init, ema_update
from v3d_tpu.engines.lr_schedule import lambda_linear
from v3d_tpu.parallel.mesh import DATA_AXIS, make_mesh


@dataclasses.dataclass
class TrainConfig:
    base_learning_rate: float = 1e-4     # V3D_512.yaml model.base_learning_rate
    weight_decay: float = 0.0
    ema_decay: float = 0.9999
    use_ema: bool = True
    max_steps: int = 100_000
    log_every: int = 100
    ckpt_every: int = 5000
    ckpt_dir: Optional[str] = None
    keep_last: int = 3          # checkpoint retention (elastic recovery)
    grad_clip: Optional[float] = None


class DiffusionTrainer:
    """Trains the VideoUNet with the engine's EDM loss on pre-encoded latent
    batches (input_key='latents', V3D_512.yaml)."""

    def __init__(self, engine, unet_params, config: TrainConfig = TrainConfig(),
                 mesh=None, num_frames: Optional[int] = None):
        self.engine = engine
        self.cfg = config
        self.mesh = mesh or make_mesh(model=1)
        self.t = num_frames or engine.num_frames

        schedule = lambda_linear()
        tx = [optax.adamw(
            lambda s: config.base_learning_rate * schedule(s),
            weight_decay=config.weight_decay)]
        if config.grad_clip:
            tx = [optax.clip_by_global_norm(config.grad_clip)] + tx
        self.opt = optax.chain(*tx)

        repl = NamedSharding(self.mesh, P())
        self.params = jax.device_put(unet_params, repl)
        self.opt_state = jax.device_put(self.opt.init(self.params), repl)
        self.ema_params = (jax.device_put(ema_init(unet_params), repl)
                           if config.use_ema else None)
        self.step = 0
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0, 1, 2))

    def _train_step(self, params, opt_state, ema_params, rng, latents, cond,
                    step):
        loss, grads = jax.value_and_grad(
            lambda p: self.engine.training_loss(
                p, rng, latents, cond, num_frames=self.t))(params)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, step,
                                    self.cfg.ema_decay)
        gnorm = optax.global_norm(grads)
        return params, opt_state, ema_params, loss, gnorm

    def shard_batch(self, batch: Dict) -> Dict:
        sh = lambda x: jax.device_put(
            jnp.asarray(x), NamedSharding(
                self.mesh, P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))))
        return jax.tree_util.tree_map(sh, batch)

    def train_step(self, rng, latents, cond) -> Dict:
        with self.mesh:
            (self.params, self.opt_state, self.ema_params, loss,
             gnorm) = self._jit_step(
                self.params, self.opt_state, self.ema_params, rng, latents,
                cond, jnp.asarray(self.step))
        self.step += 1
        return {"loss": float(loss), "grad_norm": float(gnorm),
                "step": self.step}

    def fit(self, data_iter: Iterator[Dict], rng: Optional[jax.Array] = None,
            max_steps: Optional[int] = None,
            log_fn: Callable[[Dict], None] = print,
            auto_resume: bool = True, prefetch: bool = False) -> None:
        """Elastic training loop: per-step noise RNG is ``fold_in(base, step)``
        (not a split chain), so a run restored at step N continues with
        exactly the RNG stream the uninterrupted run would have used; with
        ``auto_resume`` a restarted process picks up from the newest complete
        checkpoint in ckpt_dir (the reference has no elastic story — SURVEY
        §5; closest is Lightning --resume, mesh_recon/launch.py:127-131)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        max_steps = max_steps or self.cfg.max_steps
        if auto_resume and self.cfg.ckpt_dir and self.step == 0:
            self.resume_latest()
        if prefetch:
            # host assembly + device transfer overlap the running step
            # (torch DataLoader workers + pin_memory analog)
            from v3d_tpu.data.prefetch import device_prefetch

            data_iter = device_prefetch(data_iter, put_fn=self.shard_batch)
        t0 = time.time()
        for batch in data_iter:
            sub = jax.random.fold_in(rng, self.step)
            if not prefetch:
                batch = self.shard_batch(batch)
            stats = self.train_step(sub, batch["latents"], batch["cond"])
            if self.step % self.cfg.log_every == 0:
                stats["steps_per_sec"] = self.cfg.log_every / (time.time() - t0)
                t0 = time.time()
                log_fn(stats)
            if self.cfg.ckpt_dir and self.step % self.cfg.ckpt_every == 0:
                self.save(f"{self.cfg.ckpt_dir}/step_{self.step}")
                prune_checkpoints(self.cfg.ckpt_dir, self.cfg.keep_last)
            if self.step >= max_steps:
                break

    def save(self, path: str) -> None:
        tree = {"params": self.params, "opt_state": self.opt_state,
                "step": self.step}
        if self.ema_params is not None:
            tree["ema_params"] = self.ema_params
        save_pytree(path, tree)

    def restore(self, path: str) -> None:
        """Load a `save` checkpoint back into device-replicated state."""
        target = {"params": self.params, "opt_state": self.opt_state,
                  "step": self.step}
        if self.ema_params is not None:
            target["ema_params"] = self.ema_params
        tree = load_pytree(path, target)
        repl = NamedSharding(self.mesh, P())
        put = lambda t: jax.device_put(t, repl)
        self.params = put(tree["params"])
        self.opt_state = put(tree["opt_state"])
        if self.ema_params is not None:
            self.ema_params = put(tree["ema_params"])
        self.step = int(tree["step"])

    def resume_latest(self) -> bool:
        """Restore the newest complete checkpoint in cfg.ckpt_dir, if any.
        NOTE: the data iterator's position is the caller's to restore — pass
        a stream that skips `trainer.step` batches (or is stateless/random)."""
        path = latest_checkpoint(self.cfg.ckpt_dir) if self.cfg.ckpt_dir else None
        if path is None:
            return False
        self.restore(path)
        return True
