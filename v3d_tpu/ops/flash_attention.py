"""Pallas TPU flash attention (replacement for xformers / torch SDPA,
sgm/modules/attention.py:20-60,352-437).

Online-softmax tiled attention.  The grid is (batch*heads, q_blocks,
k_blocks): K/V stream through VMEM one block at a time (bounded VMEM even at
d=512 for the VAE's single-head attention), with running (max, sum, acc)
kept in VMEM scratch across the k dimension of the grid; the output block is
written on the last k step.  Backward is a custom VJP that recomputes
attention with the XLA einsum path (flash forward + rematerialized backward
— same math, no stored probability matrix).

Used for the UNet's spatial attention (4096 tokens, d=64) and the VAE
mid-block attention (4096 tokens, d=512); tiny temporal attention (t=18)
stays on the XLA path (ops/attention.py backend picker).
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  sm_scale: float):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Feed the MXU in the INPUT dtype and accumulate f32: a bf16 input is
    # one native MXU pass this way, while an astype-to-f32 up front forces
    # the multi-pass f32 matmul AND a (16,128)->(8,128) retiling of every
    # block — measured slower than f32 end-to-end (the round-2
    # "bf16 slower than f32" anomaly, attention_sweep.json).  Scaling and
    # softmax stay in f32.
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scores = jnp.dot(q, k.T,
                     preferred_element_type=jnp.float32) * sm_scale

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q: int, block_k: int,
                   interpret: bool = False):
    """q: (bh, sq, d), k/v: (bh, sk, d) -> (bh, sq, d)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(d)
    grid = (bh, sq // block_q, sk // block_k)
    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
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


def _flash_heads_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                        sm_scale: float, h: int, d: int):
    """Heads-resident flash block: q/k/v blocks arrive in the model's native
    (s, h*d) channel layout (contiguous DMA, no lane padding — the
    (b,s,h,d)->(bh,s,d) host transposes this replaces were pure copy time),
    with the h-head online softmax unrolled over 64-wide lane slices."""
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for i in range(h):
        sl = pl.dslice(i * d, d)
        q = q_ref[:, sl]
        k = k_ref[:, sl]
        v = v_ref[:, sl]
        scores = jnp.dot(q, k.T,
                         preferred_element_type=jnp.float32) * sm_scale
        m_prev = m_ref[:, pl.dslice(i, 1)]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        p = jnp.exp(scores - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:, pl.dslice(i, 1)] = m_new
        l_ref[:, pl.dslice(i, 1)] = (
            l_ref[:, pl.dslice(i, 1)] * alpha
            + jnp.sum(p, axis=-1, keepdims=True))
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

        @pl.when(ki == n_k - 1)
        def _(i=i, sl=sl):
            o_ref[:, sl] = (
                acc_ref[:, sl] / l_ref[:, pl.dslice(i, 1)]
            ).astype(o_ref.dtype)


def _flash_heads_forward(q, k, v, block_q: int, block_k: int,
                         interpret: bool = False):
    """q: (b, sq, h, d), k/v: (b, sk, h, d) -> (b, sq, h, d)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(d)
    grid = (b, sq // block_q, sk // block_k)
    kernel = functools.partial(_flash_heads_kernel, sm_scale=sm_scale,
                               h=h, d=d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, h * d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((None, block_k, h * d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((None, block_k, h * d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, h * d),
                               lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, h), jnp.float32),
            pltpu.VMEM((block_q, h), jnp.float32),
            pltpu.VMEM((block_q, h * d), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
      v.reshape(b, sk, h * d))
    return out.reshape(b, sq, h, d)


def _flash_packed_forward(q3, k3, v3, h: int, block_q: int, block_k: int,
                          interpret: bool = False):
    """Channel-packed flash: q3/k3/v3 stay in the model's native
    (b, s, h*d) layout and the kernel grid fetches each head's (block, d)
    slice DIRECTLY via the BlockSpec channel index — the
    (b,s,h,d)->(bh,s,d) transposes of the bh path (pure copy time, ~43
    ms/step in the r4 trace) never materialize, while the inner kernel
    (full-width d-contraction dots, online softmax) is byte-identical to
    the bh path.  Unlike the r4 heads-resident kernel there is NO in-kernel
    lane slicing (the 64-offset slices cost lane rotates); the head choice
    rides the leading grid dim."""
    b, sq, hd = q3.shape
    d = hd // h
    sk = k3.shape[1]
    sm_scale = 1.0 / math.sqrt(d)
    grid = (b * h, sq // block_q, sk // block_k)
    kernel = functools.partial(_flash_kernel, sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d),
                         lambda g, qi, ki: (g // h, qi, g % h)),
            pl.BlockSpec((None, block_k, d),
                         lambda g, qi, ki: (g // h, ki, g % h)),
            pl.BlockSpec((None, block_k, d),
                         lambda g, qi, ki: (g // h, ki, g % h)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d),
                               lambda g, qi, ki: (g // h, qi, g % h)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q3.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q3, k3, v3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_packed(q3, k3, v3, h, block_q, block_k):
    return _flash_packed_forward(q3, k3, v3, h, block_q, block_k)


def _flash_packed_fwd(q3, k3, v3, h, block_q, block_k):
    return _flash_packed_forward(q3, k3, v3, h, block_q, block_k), (q3, k3, v3)


def _flash_packed_bwd(h, block_q, block_k, res, g):
    q3, k3, v3 = res
    b, sq, hd = q3.shape
    d = hd // h

    def ref(q3, k3, v3):
        sk = k3.shape[1]
        out = _xla_reference_bshd(q3.reshape(b, sq, h, d),
                                  k3.reshape(b, sk, h, d),
                                  v3.reshape(b, sk, h, d))
        return out.reshape(b, sq, hd)

    _, vjp = jax.vjp(ref, q3, k3, v3)
    return vjp(g)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """(b, s, h, d) API over the channel-packed kernel: both reshapes are
    free (h*d contiguous), so the whole call is transpose-free."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    q3 = q.reshape(b, sq, h * d)
    k3 = k.reshape(b, sk, h * d)
    v3 = v.reshape(b, sk, h * d)
    out = _flash_packed(q3, k3, v3, h, min(block_q, sq), min(block_k, sk))
    return out.reshape(b, sq, h, d)


def _xla_reference_bshd(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_heads(q, k, v, block_q, block_k):
    return _flash_heads_forward(q, k, v, block_q, block_k)


def _flash_heads_fwd(q, k, v, block_q, block_k):
    return _flash_heads_forward(q, k, v, block_q, block_k), (q, k, v)


def _flash_heads_bwd(block_q, block_k, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_reference_bshd, q, k, v)
    return vjp(g)


_flash_heads.defvjp(_flash_heads_fwd, _flash_heads_bwd)

# heads-resident path: h*d lanes kept native.  Cap the unroll (round-2
# Mosaic note: large unrolls explode compile); h<=10 covers the UNet's
# ds1 (5 heads) and ds2 (10 heads) levels.
MAX_HEADS_RESIDENT = 10


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    heads_resident: bool = None) -> jnp.ndarray:
    """q: (b, sq, h, d); k/v: (b, sk, h, d) -> (b, sq, h, d).

    Falls back to the XLA path when shapes don't tile."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    d_ok = (d == 64) or (d % 128 == 0)
    if sq % bq != 0 or sk % bk != 0 or not d_ok:
        from v3d_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v)

    if heads_resident is None:
        # measured A/B incl. the surrounding transposes
        # (attention_heads_r4.json): the heads-resident path beats the bh
        # path at the ds2 shape (1.72 vs 1.91 ms) but loses to flash_jax
        # there (1.50) and to the bh path at ds1 (13.35 vs 12.43 — the
        # 64-lane-sliced dots cost more than the transposes save).  Kept as
        # explicit opt-in; the dispatcher never routes here implicitly.
        heads_resident = False
    if heads_resident and 1 < h <= MAX_HEADS_RESIDENT:
        return _flash_heads(q, k, v, bq, bk)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    out = _flash_bh(to_bh(q), to_bh(k), to_bh(v), bq, bk)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
