"""One-shot TPU sweep of attention backends at the V3D UNet shapes.

Batches all variants in a single process (remote compiles are slow; see
CLAUDE.md).  Writes JSON to benchmarks/results/attention_sweep.json.

    python benchmarks/attention_sweep.py
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
    print(f"{key:60s} {stats['min_s']*1e3:8.3f} ms  (mean {stats['mean_s']*1e3:.3f})",
          flush=True)


def make_qkv(shape, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(*shape).astype(np.float32), dtype)
    return mk(), mk(), mk()


def main():
    from v3d_tpu.ops.attention import xla_attention

    spatial_shapes = [(36, 4096, 5, 64), (36, 1024, 10, 64), (36, 256, 20, 64)]
    vae_shape = (6, 4096, 1, 512)

    # ---- XLA baseline (current production path) ----
    jx = jax.jit(xla_attention)
    for shape in spatial_shapes + [vae_shape]:
        q, k, v = make_qkv(shape)
        report("xla_f32logits", shape, benchmark_fn(jx, q, k, v, iters=20))

    # ---- XLA with bf16 logits (halved HBM for the materialized scores) ----
    @jax.jit
    def xla_bf16(q, k, v):
        scale = 1.0 / (q.shape[-1] ** 0.5)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale  # bf16 accum
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v)

    for shape in spatial_shapes + [vae_shape]:
        q, k, v = make_qkv(shape)
        report("xla_bf16logits", shape, benchmark_fn(xla_bf16, q, k, v, iters=20))

    # ---- jax pallas TPU flash attention, block sweep ----
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    def flash_wrapped(block_q, block_k_major, block_k, block_b):
        @jax.jit
        def fn(q, k, v):
            # our layout (b, s, h, d) -> kernel layout (b, h, s, d)
            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            o = flash_attention(
                qt, kt, vt, sm_scale=1.0 / (q.shape[-1] ** 0.5),
                block_sizes=BlockSizes(
                    block_q=block_q, block_k_major=block_k_major,
                    block_k=block_k, block_b=block_b,
                ))
            return o.transpose(0, 2, 1, 3)
        return fn

    for shape in spatial_shapes + [vae_shape]:
        b, s, h, d = shape
        tried = set()
        for bq, bkm, bk, bb in [
            (256, 256, 256, 1),
            (512, 512, 512, 1),
            (1024, 512, 512, 1),
            (512, 1024, 1024, 1),
            (1024, 1024, 1024, 1),
            (2048, 1024, 1024, 1),
            (1024, 4096, 1024, 1),
            (512, 512, 512, 2),
            (1024, 1024, 512, 4),
        ]:
            bq, bkm, bk = min(bq, s), min(bkm, s), min(bk, s)
            bb = min(bb, b)
            if bkm % bk or (bq, bkm, bk, bb) in tried:
                continue
            tried.add((bq, bkm, bk, bb))
            q, k, v = make_qkv(shape)
            try:
                fn = flash_wrapped(bq, bkm, bk, bb)
                stats = benchmark_fn(fn, q, k, v, iters=20)
                report(f"flash_q{bq}_km{bkm}_k{bk}_b{bb}", shape, stats)
            except Exception as e:
                print(f"flash {bq}/{bkm}/{bk}/{bb} @ {shape}: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # ---- temporal attention (t=18) ----
    temporal_shapes = [(8192, 18, 5, 64), (2048, 18, 10, 64), (512, 18, 20, 64)]
    for shape in temporal_shapes:
        q, k, v = make_qkv(shape)
        report("xla_f32logits", shape, benchmark_fn(jx, q, k, v, iters=20))
        from v3d_tpu.ops.temporal_attention import temporal_attention
        for bb in (16, 32, 64, 128, 256):
            try:
                stats = benchmark_fn(
                    lambda q, k, v, bb=bb: temporal_attention(q, k, v, block_b=bb),
                    q, k, v, iters=20)
                report(f"pallas_temporal_bb{bb}", shape, stats)
            except Exception as e:
                print(f"temporal bb={bb} @ {shape}: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    # correctness spot checks vs xla in f32
    from v3d_tpu.ops.temporal_attention import temporal_attention
    q, k, v = make_qkv((512, 18, 5, 64), dtype=jnp.float32)
    ref = np.asarray(xla_attention(q, k, v))
    got = np.asarray(temporal_attention(q, k, v))
    print("temporal max err:", np.abs(ref - got).max(), flush=True)

    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as fa
    q, k, v = make_qkv((2, 1024, 5, 64), dtype=jnp.float32)
    ref = np.asarray(xla_attention(q, k, v))
    got = np.asarray(fa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                        v.transpose(0, 2, 1, 3),
                        sm_scale=1.0 / 8.0).transpose(0, 2, 1, 3))
    print("flash max err:", np.abs(ref - got).max(), flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "attention_sweep.json")
    from benchmarks._io import write_json
    write_json(out, RESULTS)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
