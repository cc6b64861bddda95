"""bf16-vs-f32 flash attention after the single-MXU-pass fix (dots in input
dtype + f32 accumulate, flash_attention.py _flash_kernel).  Round-2 measured
bf16 flash SLOWER than f32 (19.75 vs 11.77 ms at the 4096-token level,
attention_sweep.json) — the kernel then upcast q/k/v to f32 before the dots,
paying the multi-pass f32 matmul plus a bf16 retiling.  This sweep records
the fixed kernel across the UNet spatial levels and block sizes.

    python benchmarks/attention_dtype_bench.py [--tag r3_dtype]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.attention_bench import bench

# UNet spatial levels (batch = 36 CFG-doubled frames)
SHAPES = [
    (36, 4096, 5, 64),   # ds=1 (64x64)
    (36, 1024, 10, 64),  # ds=2
    (36, 512, 10, 64),   # ds~3 (512-token dispatch boundary)
]
BLOCKS = [(256, 256), (512, 512), (256, 512), (512, 1024)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tag", default="r3_dtype")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from v3d_tpu.ops.attention import jax_flash_attention, xla_attention
    from v3d_tpu.ops.flash_attention import flash_attention

    results = {}
    for (b, s, h, d) in SHAPES:
        rs = np.random.RandomState(0)
        qf = rs.randn(b, s, h, d).astype(np.float32)
        for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            q = jnp.asarray(qf, dtype)
            k = jnp.asarray(rs.randn(b, s, h, d), dtype)
            v = jnp.asarray(rs.randn(b, s, h, d), dtype)
            key = f"{name}@{b}x{s}x{h}x{d}"
            t_x = bench(jax.jit(xla_attention), q, k, v, iters=args.iters)
            results["xla_" + key] = round(t_x * 1e3, 3)
            print(f"xla    {key}: {t_x*1e3:8.3f} ms", flush=True)
            # the current production pick at 512-4096-token spatial levels
            t_j = bench(jax.jit(jax_flash_attention), q, k, v,
                        iters=args.iters)
            results["flashjax_" + key] = round(t_j * 1e3, 3)
            print(f"fljax  {key}: {t_j*1e3:8.3f} ms", flush=True)
            for (bq, bk) in BLOCKS:
                if bk > s or bq > s:
                    continue
                f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, block_q=bq, block_k=bk))
                try:
                    t = bench(f, q, k, v, iters=args.iters)
                except Exception as e:
                    print(f"flash {key} bq{bq} bk{bk}: FAILED {type(e).__name__}",
                          flush=True)
                    continue
                results[f"flash_bq{bq}_bk{bk}_{key}"] = round(t * 1e3, 3)
                print(f"flash  {key} bq{bq} bk{bk}: {t*1e3:8.3f} ms",
                      flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                       f"attention_dtype_{args.tag}.json")
    from benchmarks._io import write_json
    write_json(out, results)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
