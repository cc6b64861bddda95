"""Round-2 temporal attention sweep: Pallas lane-batch kernel vs
block-diagonal packing vs XLA.  Also jax.nn.dot_product_attention control.

    python benchmarks/attention_sweep2.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from v3d_tpu.utils.profiling import benchmark_fn

RESULTS = {}


def report(name, shape, stats):
    key = f"{name}@{'x'.join(map(str, shape))}"
    RESULTS[key] = round(stats["min_s"] * 1e3, 3)
    print(f"{key:58s} {stats['min_s']*1e3:8.3f} ms", flush=True)


def make_qkv(shape, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
    return mk(), mk(), mk()


def main():
    from v3d_tpu.ops.attention import xla_attention
    from v3d_tpu.ops.temporal_attention import (
        temporal_attention,
        temporal_attention_packed,
    )

    # correctness first (f32, CPU-precision tolerances still fine on TPU)
    q, k, v = make_qkv((516, 18, 5, 64), dtype=jnp.float32)
    ref = np.asarray(jax.jit(xla_attention)(q, k, v))
    got_p = np.asarray(temporal_attention(q, k, v, block_b=256))
    got_k = np.asarray(temporal_attention_packed(q, k, v))
    print("pallas v2 err:", np.abs(ref - got_p).max(),
          " packed err:", np.abs(ref - got_k).max(), flush=True)

    jx = jax.jit(xla_attention)
    temporal_shapes = [(8192, 18, 5, 64), (2048, 18, 10, 64), (512, 18, 20, 64)]
    for shape in temporal_shapes:
        q, k, v = make_qkv(shape)
        report("xla", shape, benchmark_fn(jx, q, k, v, iters=20))
        for bb in (256, 512, 1024):
            try:
                stats = benchmark_fn(
                    lambda q, k, v, bb=bb: temporal_attention(q, k, v, block_b=bb),
                    q, k, v, iters=20)
                report(f"pallas_v2_bb{bb}", shape, stats)
            except Exception as e:
                print(f"pallas v2 bb={bb} @ {shape}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        for pk in (7, 14):
            try:
                stats = benchmark_fn(
                    lambda q, k, v, pk=pk: temporal_attention_packed(q, k, v, pack=pk),
                    q, k, v, iters=20)
                report(f"packed_{pk}", shape, stats)
            except Exception as e:
                print(f"packed {pk} @ {shape}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "attention_sweep2.json")
    from benchmarks._io import write_json
    write_json(out, RESULTS)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
