"""Pallas TPU flash attention (replacement for xformers / torch SDPA,
sgm/modules/attention.py:20-60,352-437).

Online-softmax tiled attention: the grid walks (batch*heads, q_blocks); each
program streams K/V blocks through VMEM keeping running (max, sum, acc)
statistics, so the s x s score matrix never materializes.  Backward is a
custom VJP that recomputes attention with the XLA einsum path (flash forward
+ rematerialized backward — same math, no stored probabilities).

Used for the UNet's spatial attention (4096 tokens) and the VAE mid-block
attention; tiny temporal attention (t=18) stays on the XLA path
(ops/attention.py backend picker).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale: float):
    # q_ref: (block_q, d); k_ref/v_ref: (s, d); o_ref: (block_q, d)
    block_q, d = q_ref.shape
    s = k_ref.shape[0]
    q = q_ref[:].astype(jnp.float32) * sm_scale

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, s // block_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q: int, block_k: int):
    """q: (bh, sq, d), k/v: (bh, sk, d) -> (bh, sq, d)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(d)
    grid = (bh, sq // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, sk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
    )(q, k, v)


def _xla_reference(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bh(q, k, v, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k)


def _flash_bh_fwd(q, k, v, block_q, block_k):
    return _flash_forward(q, k, v, block_q, block_k), (q, k, v)


def _flash_bh_bwd(block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference, q, k, v)
    return vjp(g)


_flash_bh.defvjp(_flash_bh_fwd, _flash_bh_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """q: (b, sq, h, d); k/v: (b, sk, h, d) -> (b, sq, h, d).

    Falls back to the XLA path when shapes don't tile (sq % block_q or
    sk % block_k nonzero)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    d_ok = (d == 64) or (d % 128 == 0)
    if sq % bq != 0 or sk % bk != 0 or not d_ok:
        from v3d_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    out = _flash_bh(to_bh(q), to_bh(k), to_bh(v), bq, bk)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
