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

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_BACKEND = "auto"


def set_default_backend(name: str) -> None:
    global _DEFAULT_BACKEND
    assert name in ("auto", "xla", "flash")
    _DEFAULT_BACKEND = name


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              backend: Optional[str] = None) -> jnp.ndarray:
    """q: (b, sq, h, d), k/v: (b, sk, h, d) -> (b, sq, h, d)."""
    backend = backend or _DEFAULT_BACKEND
    if backend == "auto":
        backend = _pick_backend(q)
    if backend == "flash":
        try:
            from v3d_tpu.ops.flash_attention import flash_attention
        except ImportError:
            return xla_attention(q, k, v)
        return flash_attention(q, k, v)
    return xla_attention(q, k, v)


def _pick_backend(q) -> str:
    # Measured on v5e (36x4096x5x64 and 6x4096x1x512): XLA's own fused
    # attention currently beats our Pallas kernel (16 vs 51 ms / 8.8 vs 11
    # ms), so "auto" resolves to XLA.  The flash kernel remains available via
    # set_default_backend("flash") and is the basis for future head-folded /
    # larger-block tuning.
    return "xla"


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    dtype = q.dtype
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
