"""Profiling / tracing utilities (TPU analog of the reference's
torch.profiler usage in scripts/tests/attention.py:78-133 and the
cuda.Event step timers in recon/train_from_vid.py:60-141)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope — view with TensorBoard / xprof."""
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock step timer with EMA (cuda.Event analog; device-synced)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else (
            self.ema * self.avg + (1 - self.ema) * dt)

    @property
    def ms(self) -> float:
        return 0.0 if self.avg is None else self.avg * 1e3


def benchmark_fn(fn: Callable, *args, iters: int = 10,
                 warmup: int = 1, repeats: int = 3) -> Dict[str, float]:
    """Time a jitted function with proper device sync.

    Sync is a SCALAR host fetch (never the whole output — fetching a large
    result over the tunneled backend transfers it at ~110MB/s and dominates
    the timing; see CLAUDE.md).  ``iters`` calls are enqueued between syncs
    so the tunnel round-trip amortizes; the per-call time is the per-repeat
    total / iters, and min/mean/std are over ``repeats`` repeats."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / iters)
    return {"mean_s": float(np.mean(times)), "min_s": float(np.min(times)),
            "std_s": float(np.std(times))}


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    # reduce on device, fetch one scalar
    np.asarray(jax.numpy.ravel(leaf)[0])


def nan_guard(name: str, tree) -> bool:
    """NaN-loss guard (video3d_diffusion.py:300-303 analog): returns True and
    prints if any leaf is non-finite."""
    bad = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            print(f"NaN guard [{name}]: non-finite values at {p}")
            bad = True
    return bad
