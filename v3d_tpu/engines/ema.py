"""EMA shadow parameters (counterpart of sgm/modules/ema.py LitEma).

Functional: ``ema_update`` returns the new shadow tree;
decay follows LitEma's warmup ``min(decay, (1 + step) / (10 + step))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # materialize copies: the shadow must not alias the live params (they are
    # donated separately by the train step)
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


def ema_decay(step, decay: float = 0.9999, use_num_updates: bool = True):
    if not use_num_updates:
        return jnp.asarray(decay)
    return jnp.minimum(decay, (1.0 + step) / (10.0 + step))


def ema_update(shadow, params, step, decay: float = 0.9999,
               use_num_updates: bool = True):
    d = ema_decay(step, decay, use_num_updates)
    return jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p), shadow, params)
