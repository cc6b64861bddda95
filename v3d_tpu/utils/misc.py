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


def enable_persistent_compile_cache(path: str | None = None) -> str:
    """Point jax at the repo-local persistent compile cache (.jax_cache/).

    The remote TPU compile service caches by HLO hash, but a local
    persistent cache additionally skips the lowering/dispatch round-trip
    entirely on later processes (the full VideoUNet program is a 10-13 min
    cold compile; warm it is seconds).  Called by every CLI app entry
    point; bench.py sets the same directory.
    """
    import os

    if path is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo, ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
