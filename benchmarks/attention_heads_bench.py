"""Heads-native vs transposed-batch flash attention at the UNet levels.

The r4 per-op trace shows ~15 ms/step of pure layout copies around the
spatial attention custom calls: the (b,s,h,d)->(bh,s,d) transposes of the
bh-batched kernel, and flash_jax's (b,h,s,d) layout at the 1024-token
level.  The heads-resident kernel (ops/flash_attention._flash_heads)
consumes the model's native channel layout directly.  Differential scan
timing (fixed dispatch cost cancelled), INCLUDING the surrounding
reshapes/transposes each path induces.

Writes benchmarks/results/attention_heads_r4.json.
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

from v3d_tpu.ops.flash_attention import flash_attention
from v3d_tpu.ops.attention import jax_flash_attention, xla_attention

N_SHORT, N_LONG = 10, 110


def bench(tag, fn, q, k, v):
    def make(n):
        @jax.jit
        def run(q):
            def body(c, _):
                return fn(c, k, v), ()
            c, _ = jax.lax.scan(body, q, None, length=n)
            return c.astype(jnp.float32).mean()
        return run

    short, long_ = make(N_SHORT), make(N_LONG)
    try:
        _ = np.asarray(short(q)); _ = np.asarray(long_(q))
    except Exception as e:
        print(f"  {tag:22s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    ts = []
    for run in (short, long_):
        best = float("inf")
        for _r in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(q))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (N_LONG - N_SHORT)
    print(f"  {tag:22s} {dt*1e3:8.3f} ms", flush=True)
    return dt * 1e3


def main():
    results = {}
    for (b, s, h, d, bq, bk) in [(36, 4096, 5, 64, 512, 1024),
                                 (36, 1024, 10, 64, 512, 1024)]:
        rng = np.random.RandomState(0)
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.randn(b, s, h, d).astype(np.float32)).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        key = f"{b}x{s}x{h}x{d}"
        print(f"shape {key}:", flush=True)
        row = {}
        row["heads_native"] = bench(
            "heads_native",
            lambda q, k, v: flash_attention(q, k, v, bq, bk,
                                            heads_resident=True), q, k, v)
        row["bh_transposed"] = bench(
            "bh_transposed",
            lambda q, k, v: flash_attention(q, k, v, bq, bk,
                                            heads_resident=False), q, k, v)
        row["flash_jax"] = bench("flash_jax", jax_flash_attention, q, k, v)
        if s <= 1024:
            row["xla"] = bench("xla", xla_attention, q, k, v)
        results[key] = row

    path = os.path.join(repo, "benchmarks", "results",
                        "attention_heads_r4.json")
    from benchmarks._io import write_json
    write_json(path, {"iters": [N_SHORT, N_LONG], "dtype": "bf16",
                      "results": results})


if __name__ == "__main__":
    main()
