"""Multi-head attention op with switchable backends.

TPU counterpart of the reference's attention backends
(sgm/modules/attention.py:20-60: torch SDPA / xformers).  Here:

- "xla": einsum QK^T -> f32 softmax -> PV.  XLA fuses this well for the
  moderate sequence lengths of the V3D workload (spatial attention at 64^2 =
  4096 tokens, temporal attention at t=18).
- "flash": Pallas flash-attention kernel (ops/flash_attention.py) for the
  large spatial sequences; falls back to "xla" off-TPU or for tiny shapes.

Shapes follow (batch, seq, heads, head_dim).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "auto"

# full-program A/B override for the spatial (>=1024-token) levels only —
# benchmarks/generation_variants.py sets this to route ds1/ds2 through the
# channel-packed kernel without touching the measured "auto" picks
_SPATIAL_OVERRIDE = os.environ.get("V3D_SPATIAL_ATTN") or None


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    assert name in ("auto", "xla", "flash", "flash_jax", "packed")
    _DEFAULT_BACKEND = name


def set_spatial_override(name) -> None:
    """Route the >=1024-token self-attention levels to ``name`` (None =
    measured auto picks).  A/B hook only."""
    global _SPATIAL_OVERRIDE
    assert name in (None, "packed", "flash", "flash_jax")
    _SPATIAL_OVERRIDE = name


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              backend: Optional[str] = None) -> jnp.ndarray:
    """q: (b, sq, h, d), k/v: (b, sk, h, d) -> (b, sq, h, d)."""
    backend = backend or _DEFAULT_BACKEND
    if backend == "auto":
        backend = _pick_backend(q, k)
    if backend == "packed":
        from v3d_tpu.ops.flash_attention import flash_attention_packed

        bq, bk = (512, 1024) if q.dtype == jnp.bfloat16 else (256, 512)
        sq, sk = q.shape[1], k.shape[1]
        while bq > 128 and sq % bq != 0:
            bq //= 2
        while bk > 128 and sk % bk != 0:
            bk //= 2
        return flash_attention_packed(q, k, v, bq, bk)
    if backend == "flash_jax":
        return jax_flash_attention(q, k, v)
    if backend == "flash":
        try:
            from v3d_tpu.ops.flash_attention import flash_attention
        except ImportError:
            return xla_attention(q, k, v)
        # block sizes from attention_dtype_r3_dtype.json: bf16's single
        # MXU pass affords the wide (512, 1024) blocks (908 vs 1056 rel
        # units at 4096 tokens); f32's multi-pass matmul wants the smaller
        # (256, 512) footprint (2794 vs 4556 for the wide blocks).
        # Blocks must tile the sequence or flash_attention silently falls
        # back to XLA (materializing the O(seq^2) f32 logits the bf16-
        # resident UNet can't afford) — shrink to the largest divisor.
        if q.dtype == jnp.bfloat16:
            bq, bk = 512, 1024
        else:
            bq, bk = 256, 512
        sq, sk = q.shape[1], k.shape[1]
        while bq > 128 and sq % bq != 0:
            bq //= 2
        while bk > 128 and sk % bk != 0:
            bk //= 2
        return flash_attention(q, k, v, block_q=bq, block_k=bk)
    return xla_attention(q, k, v)


def _pick_backend_dims(sq: int, sk: int, d: int) -> str:
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if not (on_tpu and d == 64 and sq == sk):
        return "xla"
    if _SPATIAL_OVERRIDE and sq >= 1024:
        return _SPATIAL_OVERRIDE
    if sq >= 2048 and sq % 512 == 0:
        return "flash"
    if sq == 1024:
        # r4 A/B (attention_heads_r4.json + full-program bench): the
        # heads-resident kernel removes the layout transposes but loses to
        # the stock jax kernel here (1.71 vs 1.50 ms standalone; 11.88 vs
        # 11.70 s full generation) — flash_jax stays
        return "flash_jax"
    return "xla"


def _pick_backend(q, k) -> str:
    # Measured on v5e (benchmarks/results/attention_sweep.json +
    # attention_dtype_r3_dtype.json).  At the 4096-token spatial level with
    # bf16 inputs OUR flash kernel (single-MXU-pass dots in the input
    # dtype) is ~3.2x faster than the stock jax pallas kernel and also
    # beats XLA — and XLA materializes the (36,5,4096,4096) f32 logits
    # tensor (12 GB), which the bf16-resident 1.5B UNet cannot afford.  At
    # the 1024-token level the stock jax flash kernel stays best by a hair
    # (135.8 vs 139.7 rel units); at 512 tokens plain XLA wins (74 vs 88)
    # — the kernel launch no longer pays.  Tiny/cross shapes stay on XLA.
    b, sq, h, d = q.shape
    return _pick_backend_dims(sq, k.shape[1], d)


def _pick_backend_bhsd(sq: int, sk: int, d: int) -> str:
    """Measured auto routing for the (b,h,s,d) layout (the production
    default since r5).  Full-generation A/B (generation_variants_r5.json):
    with the layout copies gone, the stock jax flash kernel wins BOTH
    spatial levels (bhsd_flashjax 11.38 s vs bhsd+our-bh-kernel 11.56 s vs
    r4 bshd baseline 11.71 s) — our bh kernel's standalone ds2 win was an
    artifact of the transposes it saved, not kernel speed."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if not (on_tpu and d == 64 and sq == sk):
        return "xla"
    if _SPATIAL_OVERRIDE and sq >= 1024:
        return _SPATIAL_OVERRIDE
    if sq >= 1024 and sq % 512 == 0:
        return "flash_jax"
    return "xla"


def attention_bhsd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   backend: Optional[str] = None) -> jnp.ndarray:
    """Attention on the (b, h, s, d) layout — the layout the flash kernels
    batch over, produced directly by the bhsd projection einsums
    (models/attention_blocks._QKVProjBHSD), so NO transposes surround the
    custom call: our bh kernel takes a free reshape to (b*h, s, d); the
    stock jax kernel consumes (b,h,s,d) natively."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    backend = backend or _DEFAULT_BACKEND
    if backend in ("auto", "packed"):
        backend = _pick_backend_bhsd(sq, sk, d)
    if backend == "flash_jax":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        blk = min(1024, sq)
        sizes = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
            block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
            block_q_dq=blk,
        )
        return flash_attention(q, k, v, sm_scale=1.0 / (d ** 0.5),
                               block_sizes=sizes)
    if backend in ("flash", "packed"):
        from v3d_tpu.ops.flash_attention import _flash_bh

        bq, bk = (512, 1024) if q.dtype == jnp.bfloat16 else (256, 512)
        while bq > 128 and sq % bq != 0:
            bq //= 2
        while bk > 128 and sk % bk != 0:
            bk //= 2
        out = _flash_bh(q.reshape(b * h, sq, d), k.reshape(b * h, sk, d),
                        v.reshape(b * h, sk, d), bq, bk)
        return out.reshape(b, h, sq, d)
    # xla fallback on the bhsd layout
    dtype = q.dtype
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def jax_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                        ) -> jnp.ndarray:
    """jax.experimental.pallas TPU flash attention with swept block sizes
    (q1024/km1024/k1024 won at 36x1024x10x64; clamped to seq)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    s = q.shape[1]
    blk = min(1024, s)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    o = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        sm_scale=1.0 / (q.shape[-1] ** 0.5), block_sizes=sizes)
    return o.transpose(0, 2, 1, 3)


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    dtype = q.dtype
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
