"""Small shared helpers (counterpart of sgm/util.py:149-199)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append trailing singleton dims until ``x.ndim == target_ndim``."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"x has {x.ndim} dims but target is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def default(val, d):
    if val is not None:
        return val
    return d() if callable(d) else d


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
