"""Attention microbenchmark harness (counterpart of
scripts/tests/attention.py:10-319).

Times the attention backends (XLA fused vs Pallas flash) across the V3D
workload shapes, plus transformer-block timings — the TPU analog of the
reference's torch.utils.benchmark + profiler harness.

    python benchmarks/attention_bench.py [--profile-dir /tmp/trace]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# (batch, seq, heads, head_dim) — UNet spatial levels + VAE mid attention
SHAPES = [
    (36, 4096, 5, 64),    # ds=1 spatial (64x64)
    (36, 1024, 10, 64),   # ds=2 spatial
    (36, 256, 20, 64),    # ds=4 spatial
    (7380, 18, 5, 64),    # temporal attention ((b hw), t, heads, d)
    (6, 4096, 1, 512),    # VAE mid block
]


def bench(fn, *args, iters: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # force a device sync through a host fetch of a small slice
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from v3d_tpu.ops.attention import xla_attention
    from v3d_tpu.ops.flash_attention import flash_attention

    dtype = jnp.dtype(args.dtype)
    rs = np.random.RandomState(0)
    print(f"backend={jax.default_backend()} dtype={args.dtype}")
    print(f"{'shape':>24} {'xla_ms':>8} {'flash_ms':>9} {'flops':>10}")
    for (b, s, h, d) in SHAPES:
        q = jnp.asarray(rs.randn(b, s, h, d), dtype)
        k = jnp.asarray(rs.randn(b, s, h, d), dtype)
        v = jnp.asarray(rs.randn(b, s, h, d), dtype)
        xla = jax.jit(xla_attention)
        fl = jax.jit(flash_attention)
        t_x = bench(xla, q, k, v)
        try:
            t_f = bench(fl, q, k, v)
        except Exception as e:  # kernel constraints
            t_f = float("nan")
        flops = 4 * b * h * s * s * d
        print(f"{str((b, s, h, d)):>24} {t_x*1e3:8.2f} {t_f*1e3:9.2f} "
              f"{flops/1e9:9.1f}G")

    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            b, s, h, d = SHAPES[0]
            q = jnp.asarray(rs.randn(b, s, h, d), dtype)
            jax.block_until_ready(jax.jit(xla_attention)(q, q, q))
        print(f"trace written to {args.profile_dir}")


if __name__ == "__main__":
    main()
