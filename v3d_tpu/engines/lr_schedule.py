"""LR schedules (counterpart of sgm/lr_scheduler.py).

All return multiplicative factors on the base LR, as optax schedules.
V3D uses LambdaLinearScheduler(warm_up_steps=[1], f_start=[1e-6],
f_max=[1.0], f_min=[1.0]) — one warmup step then flat.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from v3d_tpu.core.registry import register


@register("lambda_linear_scheduler")
def lambda_linear(warm_up_steps: Sequence[int] = (1,),
                  f_start: Sequence[float] = (1e-6,),
                  f_max: Sequence[float] = (1.0,),
                  f_min: Sequence[float] = (1.0,),
                  cycle_lengths: Sequence[int] = (10**13,)):
    """lr_scheduler.py:113-134: per-cycle linear warmup then linear decay to
    f_min over the cycle."""
    warm_up_steps = list(warm_up_steps)
    f_start = list(f_start)
    f_max = list(f_max)
    f_min = list(f_min)
    cycle_lengths = list(cycle_lengths)
    cum = np.cumsum([0] + cycle_lengths)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # single-cycle fast path (V3D)
        cycle = 0
        n = step - float(cum[cycle])
        wu = float(warm_up_steps[cycle])
        cl = float(cycle_lengths[cycle])
        warm = f_start[cycle] + (f_max[cycle] - f_start[cycle]) * n / max(wu, 1.0)
        decay = f_min[cycle] + (f_max[cycle] - f_min[cycle]) * (cl - n) / cl
        return jnp.where(n < wu, warm, decay)

    return schedule


@register("lambda_warmup_cosine_scheduler")
def lambda_warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                         lr_start: float, max_decay_steps: int):
    """lr_scheduler.py:4-49: linear warmup then half-cosine to lr_min."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + lr_max * step / max(warm_up_steps, 1)
        t = jnp.clip((step - warm_up_steps)
                     / max(max_decay_steps - warm_up_steps, 1), 0, 1)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * math.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule
