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
    # Flash pays off for long sequences on TPU; otherwise XLA's fused softmax
    # attention is already near roofline for these sizes.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    d = q.shape[-1]
    if on_tpu and q.shape[1] >= 1024 and (d == 64 or d % 128 == 0):
        return "flash"
    return "xla"


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    dtype = q.dtype
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
