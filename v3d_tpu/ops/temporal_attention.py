"""Fused temporal attention (seq = num_frames = 18).

The VideoUNet's temporal attention (sgm/modules/video_attention.py:113-140)
attends across t=18 frames at EVERY spatial location: shapes are
(batch=b*s, t=18, heads, 64).  The FLOPs are negligible (18x18 logits) but
XLA lowers the huge batch of tiny matmuls poorly (~10 ms at the ds=1 shape,
benchmarks/profile_unet_step.py / attention_sweep.py) because an 18x18x64
dot leaves the 128x128 MXU almost idle and the softmax runs as multi-pass
HBM traffic.

Two TPU-native formulations:

- ``temporal_attention`` (Pallas): batch in the LANE dimension.  Inputs are
  transposed to (t, d, B*h) and the kernel holds one (t, d, block_b) slab of
  q/k/v in VMEM, computing logits/softmax/PV with VPU broadcast-reduces
  whose minor axis is the batch — full 128-lane utilization, single pass
  over HBM.
- ``temporal_attention_packed`` (pure XLA): block-diagonal packing.  PACK=7
  samples are concatenated to a 126-row super-sequence (126 ~ the 128 MXU
  tile), one batched 126x126 matmul computes all 49 cross-sample tiles, and
  an additive -inf mask kills the 42 off-diagonal ones before softmax, so
  the result is EXACT.  7x redundant FLOPs, but the MXU runs dense instead
  of 18/128-occupied.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t: int):
    q = q_ref[...].astype(jnp.float32) * scale  # (t, d, bb)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    rows = []
    for i in range(t):
        s_i = jnp.sum(q[i][None, :, :] * k, axis=1)          # (t, bb)
        s_i = s_i - jnp.max(s_i, axis=0, keepdims=True)
        p = jnp.exp(s_i)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        rows.append(jnp.sum(p[:, None, :] * v, axis=0))       # (d, bb)
    o_ref[...] = jnp.stack(rows).astype(o_ref.dtype)          # (t, d, bb)


@functools.partial(jax.jit, static_argnames=("block_b",))
def temporal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       block_b: int = 512) -> jnp.ndarray:
    """q,k,v: (B, t, h, d) -> (B, t, h, d); softmax over the key frames."""
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    n = b * h
    block = min(block_b, n)
    pad = (-n) % block

    def prep(x):  # (B, t, h, d) -> (t, d, B*h), batch minor (lanes)
        x = x.transpose(1, 3, 0, 2).reshape(t, d, n)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    grid = ((n + pad) // block,)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, t=t),
        grid=grid,
        in_specs=[pl.BlockSpec((t, d, block), lambda i: (0, 0, i))] * 3,
        out_specs=pl.BlockSpec((t, d, block), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((t, d, n + pad), q.dtype),
        interpret=not _on_tpu(),
    )(qf, kf, vf)
    out = out[:, :, :n].reshape(t, d, b, h).transpose(2, 0, 3, 1)
    return out


@functools.partial(jax.jit, static_argnames=("pack",))
def temporal_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              pack: int = 7) -> jnp.ndarray:
    """Exact block-diagonal-packed attention: (B, t, h, d) -> same."""
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    n = b * h
    pad = (-n) % pack
    g = (n + pad) // pack
    s = pack * t

    def prep(x):  # (B, t, h, d) -> (g, pack*t, d)
        x = x.transpose(0, 2, 1, 3).reshape(n, t, d)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return x.reshape(g, s, d)

    qf, kf, vf = prep(q), prep(k), prep(v)
    mask = np.full((s, s), -np.inf, np.float32)
    for i in range(pack):
        mask[i * t:(i + 1) * t, i * t:(i + 1) * t] = 0.0
    logits = jnp.einsum("gqd,gkd->gqk", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.asarray(mask)[None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("gqk,gkd->gqd", probs, vf)
    out = out.reshape(g * pack, t, d)[:n]
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t: int,
                   pack: int, inner: int):
    """One grid cell: ``inner`` groups of ``pack`` samples, each group one
    (pack*t, pack*t) MXU matmul with a block-diagonal softmax mask held in
    VMEM — the packed trick of temporal_attention_packed but with ZERO
    logit HBM traffic."""
    s = pack * t
    # static block-diagonal mask: -inf off the 18x18 diagonal blocks
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0) // t
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1) // t
    neg = jnp.where(row_blk == col_blk, 0.0, -jnp.inf).astype(jnp.float32)
    for j in range(inner):
        sl = pl.dslice(j * s, s)
        q = q_ref[sl, :]
        k = k_ref[sl, :]
        v = v_ref[sl, :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + neg
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(q.dtype)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[sl, :] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pack", "inner"))
def temporal_attention_mxu(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           pack: int = 7, inner: int = 8) -> jnp.ndarray:
    """Block-packed temporal attention fully fused in Pallas: exact, runs
    the 18x18 attention as dense 126x126 MXU tiles with an in-VMEM mask,
    single HBM pass.  q,k,v: (B, t, h, d)."""
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    n = b * h
    group = pack * inner                 # samples per grid cell
    pad = (-n) % group

    def prep(x):  # (B, t, h, d) -> (n_pad*t, d) rows, sample-major
        x = x.transpose(0, 2, 1, 3).reshape(n, t, d)
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return x.reshape((n + pad) * t, d)

    qf, kf, vf = prep(q), prep(k), prep(v)
    rows = pack * inner * t
    grid = ((n + pad) // group,)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, t=t, pack=pack,
                          inner=inner),
        grid=grid,
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0))] * 3,
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(((n + pad) * t, d), q.dtype),
        interpret=not _on_tpu(),
    )(qf, kf, vf)
    out = out.reshape(n + pad, t, d)[:n]
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# In-model core: (t, d, n) layout with custom VJP, pallas on TPU
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    import os
    flag = os.environ.get("V3D_TPU_TEMPORAL_KERNEL", "auto")
    if flag in ("0", "off"):
        return False
    if flag in ("1", "on"):
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _xla_core(qf, kf, vf):
    """Reference math in the (t, d, n) layout (softmax over key frames j)."""
    scale = 1.0 / (qf.shape[1] ** 0.5)
    s = jnp.einsum("idn,jdn->ijn", qf, kf,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=1).astype(qf.dtype)
    return jnp.einsum("ijn,jdn->idn", p, vf)


def _pallas_core(qf, kf, vf, block: int = 256, interpret: bool = False):
    t, d, n = qf.shape
    scale = 1.0 / (d ** 0.5)
    blk = min(block, n)
    pad = (-n) % blk
    if pad:
        qf, kf, vf = (jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
                      for x in (qf, kf, vf))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, t=t),
        grid=((n + pad) // blk,),
        in_specs=[pl.BlockSpec((t, d, blk), lambda i: (0, 0, i))] * 3,
        out_specs=pl.BlockSpec((t, d, blk), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((t, d, n + pad), qf.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :, :n] if pad else out


@jax.custom_vjp
def temporal_core(qf: jnp.ndarray, kf: jnp.ndarray, vf: jnp.ndarray
                  ) -> jnp.ndarray:
    """(t, d, n) fused temporal attention.  Pallas forward on TPU; the
    backward recomputes through the XLA formulation (same trade as
    ops/flash_attention.py: no activation storage, exact grads)."""
    if _on_tpu():
        return _pallas_core(qf, kf, vf)
    return _xla_core(qf, kf, vf)


def _core_fwd(qf, kf, vf):
    return temporal_core(qf, kf, vf), (qf, kf, vf)


def _core_bwd(res, g):
    qf, kf, vf = res
    _, vjp = jax.vjp(_xla_core, qf, kf, vf)
    return vjp(g)


temporal_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# v4: whole-temporal-attention mega-kernel (projections + attention + out
# projection fused; natural (b, t, s, c) layout, zero HBM transposes)
# ---------------------------------------------------------------------------


def _block_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref, *,
                  t: int, heads: int, dim_head: int):
    """Per-head pipeline: Mosaic rejects reshapes that split the lane dim
    (hd -> (h, d)), so weights arrive pre-split as (h, c, d) / (h, d, c)
    and each head runs dot -> leading-dim split -> minor transpose ->
    VPU attention (batch in lanes) -> inverse -> accumulated out-dot."""
    x = x_ref[0]                                  # (t, s_blk, c)
    s_blk, c = x.shape[1], x.shape[2]
    x2 = x.reshape(t * s_blk, c)
    scale = 1.0 / (dim_head ** 0.5)

    acc = jnp.zeros((t * s_blk, c), jnp.float32)
    for head in range(heads):
        def proj(w_ref):
            y = jax.lax.dot_general(
                x2, w_ref[head], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.transpose(y.reshape(t, s_blk, dim_head), (0, 2, 1))

        q = proj(wq_ref) * scale                  # (t, d, s_blk)
        k = proj(wk_ref)
        v = proj(wv_ref)
        rows = []
        for i in range(t):
            s_i = jnp.sum(q[i][None, :, :] * k, axis=1)        # (t, s_blk)
            s_i = s_i - jnp.max(s_i, axis=0, keepdims=True)
            p = jnp.exp(s_i)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            rows.append(jnp.sum(p[:, None, :] * v, axis=0))     # (d, s_blk)
        o = jnp.stack(rows)                                     # (t, d, s_blk)
        o = jnp.transpose(o, (0, 2, 1)).reshape(t * s_blk, dim_head)
        acc = acc + jax.lax.dot_general(
            o.astype(x.dtype), wo_ref[head], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = acc + bo_ref[...].astype(jnp.float32)       # bo is (1, c)
    o_ref[0] = out.reshape(t, s_blk, c).astype(o_ref.dtype)


def _block_xla(x, wq, wk, wv, wo, bo, heads):
    """XLA-equivalent of the fused block (CPU path + custom-VJP backward)."""
    b, t, s, c = x.shape
    hd = wq.shape[1]
    dh = hd // heads

    def proj(w):
        return jnp.einsum("btsc,chd->tdbsh", x,
                          w.reshape(c, heads, dh)).reshape(t, dh, b * s * heads)

    o = _xla_core(proj(wq), proj(wk), proj(wv))
    o = o.reshape(t, dh, b, s, heads)
    out = jnp.einsum("tdbsh,hdc->btsc", o, wo.reshape(heads, dh, c))
    return out + bo[None, None, None, :]


def _compiler_params(interpret: bool):
    """Raise the scoped-VMEM ceiling: the fused block's working set
    (x block + f32 accumulator + per-head q/k/v + double buffering) is
    ~18-40MB, over the default 16MB but far under the chip's VMEM."""
    if interpret:
        return None
    import jax.experimental.pallas.tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pallas_block(x, wq, wk, wv, wo, bo, heads: int,
                  interpret: bool = False):
    b, t, s, c = x.shape
    hd = wq.shape[1]
    dh = hd // heads
    # 64-wide spatial blocks keep the per-step working set (~9MB: x block +
    # f32 accumulator + per-head q/k/v slabs, double-buffered) under the
    # 16MB scoped-VMEM ceiling this toolchain enforces regardless of
    # vmem_limit_bytes; 128-wide blocks overran it by 1.76MB at ds1.
    s_blk = 64 if s % 64 == 0 else s
    assert s % s_blk == 0, (s, s_blk)
    n_sb = s // s_blk
    dt = x.dtype
    # Mosaic (this toolchain) only pipelines varying block indices on the
    # LEADING dim, so fold (b, s-blocks) into it.  The (t <-> s-block)
    # transpose is one fused XLA pass — far cheaper than the per-layer
    # dot+transpose+reshape chain this kernel replaces.
    x4 = x.reshape(b, t, n_sb, s_blk, c).transpose(0, 2, 1, 3, 4)
    x4 = x4.reshape(b * n_sb, t, s_blk, c)
    # pre-split weights by head on the host side (tiny tensors)
    wq3 = wq.reshape(c, heads, dh).transpose(1, 0, 2).astype(dt)
    wk3 = wk.reshape(c, heads, dh).transpose(1, 0, 2).astype(dt)
    wv3 = wv.reshape(c, heads, dh).transpose(1, 0, 2).astype(dt)
    wo3 = wo.reshape(heads, dh, c).astype(dt)
    out = pl.pallas_call(
        functools.partial(_block_kernel, t=t, heads=heads, dim_head=dh),
        grid=(b * n_sb,),
        in_specs=[
            pl.BlockSpec((1, t, s_blk, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((heads, c, dh), lambda i: (0, 0, 0)),
            pl.BlockSpec((heads, c, dh), lambda i: (0, 0, 0)),
            pl.BlockSpec((heads, c, dh), lambda i: (0, 0, 0)),
            pl.BlockSpec((heads, dh, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, s_blk, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n_sb, t, s_blk, c), dt),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x4, wq3, wk3, wv3, wo3, bo.reshape(1, c).astype(dt))
    out = out.reshape(b, n_sb, t, s_blk, c).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, t, s, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def temporal_block_attention(x, wq, wk, wv, wo, bo, heads: int):
    """Fused temporal self-attention layer: x (b, t, s, c) [post-norm
    tokens] -> (b, t, s, c).  On TPU one Pallas program does QKV projection
    (MXU), per-(pixel, head) 18-frame attention (VPU, batch in lanes), and
    the output projection — HBM traffic is read x + read weights once +
    write out.  Backward recomputes through the XLA formulation."""
    if not _on_tpu():
        return _block_xla(x, wq, wk, wv, wo, bo, heads)
    return _pallas_block(x, wq, wk, wv, wo, bo, heads)


def _block_fwd(x, wq, wk, wv, wo, bo, heads):
    return temporal_block_attention(x, wq, wk, wv, wo, bo, heads), (
        x, wq, wk, wv, wo, bo)


def _block_bwd(heads, res, g):
    x, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: _block_xla(*a, heads), x, wq, wk, wv, wo, bo)
    return vjp(g)


temporal_block_attention.defvjp(_block_fwd, _block_bwd)
