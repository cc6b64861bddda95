"""Parameter dtype utilities for deployment.

On a 16GB v5e chip, the 1.5B-param UNet must be resident in bf16: f32
weights + bf16 working copies thrash HBM (measured: the 25-step scan goes
from ~0.5 s/step to unusable).  ``cast_params`` converts a converted/loaded
f32 tree for serving; keep f32 masters for training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(tree, dtype=jnp.bfloat16):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
