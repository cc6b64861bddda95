"""GroupNorm backend bench at the VideoUNet's hot shapes.

The r4 per-op trace (benchmarks/profile_unet_step) shows GN stat
convert_reduce fusions at 137 ms of the 457 ms denoise step.  This times
the XLA reference formula vs the fused Pallas kernels
(ops/fused_groupnorm) on-chip, each as a lax.scan of ``ITERS`` dependent
applications inside ONE jitted program (per-dispatch tunnel latency ~50 ms
would otherwise dominate; CLAUDE.md).

Writes benchmarks/results/gn_bench_r4.json.
"""

import json
import os
import sys
import time

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

from v3d_tpu.ops import fused_groupnorm as fg

SHAPES = [
    (36, 64, 64, 320),    # ds1 spatial GN
    (36, 32, 32, 640),    # ds2
    (36, 16, 16, 1280),   # ds4
    (36, 8, 8, 1280),     # ds8
    (2, 18, 64, 64, 320),  # time-stack resblock GN (5D)
]
N_SHORT, N_LONG = 20, 220


def bench(tag, fn, x):
    """Differential timing: (t_long - t_short) / (N_LONG - N_SHORT) cancels
    the fixed dispatch+sync round trip (~30-100 ms through the tunnel) that
    otherwise floors every measurement at ~1 ms/iter."""

    def make(n):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return c.astype(jnp.float32).mean()
        return run

    short, long_ = make(N_SHORT), make(N_LONG)
    _ = np.asarray(short(x)); _ = np.asarray(long_(x))  # compile both
    ts = []
    for run, n in ((short, N_SHORT), (long_, N_LONG)):
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(x))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (N_LONG - N_SHORT)
    print(f"  {tag:18s} {dt*1e3:8.3f} ms", flush=True)
    return dt * 1e3


def main():
    results = {}
    for shape in SHAPES:
        C = shape[-1]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
        scale = jnp.ones((C,), jnp.float32)
        bias = jnp.zeros((C,), jnp.float32)
        key = "x".join(map(str, shape))
        print(f"shape {key}:", flush=True)
        row = {}
        row["xla_gn_silu"] = bench(
            "xla_gn_silu", lambda c: fg._reference(c, scale, bias, 32, 1e-5, True), x)
        row["pallas_gn_silu"] = bench(
            "pallas_gn_silu",
            lambda c: fg._pallas_group_norm(
                c.reshape(c.shape[0], -1, C), scale, bias, 32, 1e-5, True,
                False).reshape(c.shape), x)

        def stats_only(c):
            xf = c.astype(jnp.float32)
            red = tuple(range(1, c.ndim - 1))
            s1 = jnp.sum(xf, axis=red)
            s2 = jnp.sum(xf * xf, axis=red)
            return c * (1.0 + 0.0 * (s1[0, 0] + s2[0, 0])).astype(c.dtype)

        row["xla_stats_only"] = bench("xla_stats_only", stats_only, x)
        results[key] = row

    from benchmarks._io import write_json

    outpath = os.path.join(repo, "benchmarks", "results", "gn_bench_r4.json")
    write_json(outpath, {"iters": [N_SHORT, N_LONG], "dtype": "bf16",
                         "results": results})


if __name__ == "__main__":
    main()
