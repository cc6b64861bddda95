"""Channel-packed flash (transpose-free) vs bh/flash_jax at UNet levels.

VERDICT r4 task 3a: the r4 trace shows ~43 ms/step of layout copies,
mostly the (b,s,h,d)->(bh,s,d)/(b,h,s,d) transposes around attention
custom calls.  `flash_attention_packed` keeps q/k/v in the model's native
(b, s, h*d) layout and lets the Pallas grid fetch each head's (block, d)
slice via the BlockSpec channel index — zero transposes, inner kernel
identical to the bh path.  Differential scan timing INCLUDING each path's
surrounding reshapes/transposes; block sweep for the packed path.

Writes benchmarks/results/attention_packed_r5.json.
"""

import os
import sys
import time

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

from v3d_tpu.ops.attention import jax_flash_attention
from v3d_tpu.ops.flash_attention import (flash_attention,
                                         flash_attention_packed)

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
        print(f"  {tag:26s} FAILED {type(e).__name__}: {str(e)[:200]}",
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
    print(f"  {tag:26s} {dt*1e3:8.3f} ms", flush=True)
    return dt * 1e3


def main():
    results = {}
    for (b, s, h, d) in [(36, 4096, 5, 64), (36, 1024, 10, 64)]:
        rng = np.random.RandomState(0)
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.randn(b, s, h, d).astype(np.float32)).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        key = f"{b}x{s}x{h}x{d}"
        print(f"shape {key}:", flush=True)
        row = {}
        # parity first: packed vs the bh flash path (itself XLA-parity-
        # tested; a direct XLA reference at 4096 tokens would materialize
        # the 12 GB f32 logits tensor and OOM the 16 GB chip)
        try:
            ref = np.asarray(jax.jit(
                lambda q, k, v: flash_attention(q, k, v, 512, 1024,
                                                heads_resident=False)
            )(q, k, v).astype(jnp.float32))
            got = np.asarray(jax.jit(
                lambda q, k, v: flash_attention_packed(q, k, v, 512, 1024)
            )(q, k, v).astype(jnp.float32))
            err = float(np.max(np.abs(ref - got)))
            row["max_err_vs_bh"] = err
            print(f"  parity max|err| = {err:.2e}", flush=True)
        except Exception as e:
            row["max_err_vs_bh"] = f"FAILED {type(e).__name__}: {e}"[:200]
            print(f"  parity FAILED: {str(e)[:200]}", flush=True)
        for (bq, bk) in [(512, 1024), (256, 512), (512, 512), (1024, 1024)]:
            if bq > s or bk > s:
                continue
            row[f"packed_q{bq}_k{bk}"] = bench(
                f"packed_q{bq}_k{bk}",
                lambda q, k, v, bq=bq, bk=bk: flash_attention_packed(
                    q, k, v, bq, bk), q, k, v)
        row["bh_transposed"] = bench(
            "bh_transposed",
            lambda q, k, v: flash_attention(q, k, v, 512, 1024,
                                            heads_resident=False), q, k, v)
        row["flash_jax"] = bench("flash_jax", jax_flash_attention, q, k, v)
        results[key] = row

    from benchmarks._io import write_json
    write_json(os.path.join(repo, "benchmarks", "results",
                            "attention_packed_r5.json"),
               {"iters": [N_SHORT, N_LONG], "dtype": "bf16",
                "results": results})


if __name__ == "__main__":
    main()
