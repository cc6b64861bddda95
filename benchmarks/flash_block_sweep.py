"""Block-size sweep of the stock jax TPU flash kernel at the ds1 shape.

The r5 xplane trace shows the five ds1 self-attention calls
(bf16[36,5,4096,64]) at 11.54 ms each — ~34% MFU against the ~50% cap the
d=64 contraction allows.  ops/attention.attention_bhsd uses blk=1024
everywhere (the value that won the 36x1024x10x64 sweep); this sweeps
(block_q, block_k) at the 4096-token shape, forward-only (generation takes
no grads), with differential scan timing (CLAUDE.md: one dispatch+sync
floors at ~1 ms through the tunnel).

Writes benchmarks/results/flash_block_sweep_r5.json.
"""

import functools
import itertools
import json
import os
import sys
import time

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax
import jax.numpy as jnp

os.makedirs(os.path.join(repo, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, S, D = 36, 5, 4096, 64
N_SHORT, N_LONG = 4, 24


def run_one(bq, bk):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

    def step(q, _):
        o = flash_attention(q, q, q, sm_scale=D ** -0.5, block_sizes=sizes)
        return o, ()

    @functools.partial(jax.jit, static_argnums=(1,))
    def scan_n(q, n):
        o, _ = jax.lax.scan(step, q, None, length=n)
        return o

    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D),
                          jnp.bfloat16)
    # compile both lengths
    np.asarray(scan_n(q, N_SHORT)[0, 0, 0, 0])
    np.asarray(scan_n(q, N_LONG)[0, 0, 0, 0])
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(scan_n(q, N_SHORT)[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(scan_n(q, N_LONG)[0, 0, 0, 0])
        tl.append(time.perf_counter() - t0)
    ms = (min(tl) - min(ts)) / (N_LONG - N_SHORT) * 1e3
    return round(ms, 3)


def main():
    out = {"shape": f"{B}x{H}x{S}x{D}", "dtype": "bf16",
           "method": f"differential lax.scan {N_SHORT} vs {N_LONG}",
           "results": {}}
    combos = [(bq, bk) for bq, bk in itertools.product(
        (512, 1024, 2048, 4096), (512, 1024, 2048, 4096))]
    for bq, bk in combos:
        tag = f"q{bq}_k{bk}"
        try:
            ms = run_one(bq, bk)
            out["results"][tag] = ms
        except Exception as e:
            out["results"][tag] = f"FAILED {type(e).__name__}: {e}"[:160]
        print(tag, out["results"][tag], flush=True)
        from benchmarks._io import write_json
        write_json(os.path.join(repo, "benchmarks", "results",
                                "flash_block_sweep_r5.json"), out)


if __name__ == "__main__":
    main()
