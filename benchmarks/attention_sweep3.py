"""Round-3: MXU block-packed Pallas temporal kernel vs round-2 winners.

    python benchmarks/attention_sweep3.py
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
        temporal_attention_mxu,
    )

    # correctness (f32; expect ~1e-5 vs true math — compare against the
    # HIGHEST-precision xla run to avoid judging vs bf16 matmuls)
    q, k, v = make_qkv((516, 18, 5, 64), dtype=jnp.float32)
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(jax.jit(xla_attention)(q, k, v))
    got = np.asarray(temporal_attention_mxu(q, k, v))
    print("mxu packed err vs f32 ref:", np.abs(ref - got).max(), flush=True)

    jx = jax.jit(xla_attention)
    for shape in [(8192, 18, 5, 64), (2048, 18, 10, 64), (512, 18, 20, 64)]:
        q, k, v = make_qkv(shape)
        report("xla", shape, benchmark_fn(jx, q, k, v, iters=20))
        report("pallas_v2_bb256", shape, benchmark_fn(
            lambda q, k, v: temporal_attention(q, k, v, block_b=256),
            q, k, v, iters=20))
        for pack, inner in [(7, 4), (7, 8), (7, 16), (14, 4)]:
            try:
                stats = benchmark_fn(
                    lambda q, k, v, pk=pack, inn=inner:
                    temporal_attention_mxu(q, k, v, pack=pk, inner=inn),
                    q, k, v, iters=20)
                report(f"mxu_p{pack}_i{inner}", shape, stats)
            except Exception as e:
                print(f"mxu {pack}/{inner} @ {shape}: {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "attention_sweep3.json")
    from benchmarks._io import write_json
    write_json(out, RESULTS)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
