"""Fused temporal attention kernel (seq = num_frames = 18).

The VideoUNet's temporal attention (sgm/modules/video_attention.py:113-140)
attends across t=18 frames at EVERY spatial location: shapes are
(batch=b*s, t=18, heads, 64).  The FLOPs are negligible (18x18 logits) but
XLA lowers the batched tiny matmuls + multi-pass softmax as a chain of
HBM-bound elementwise/transpose ops (~75 ms/step measured across the UNet,
benchmarks/profile_unet_step.py).  This Pallas kernel keeps one block of
rows resident in VMEM and does QK^T -> softmax -> PV in a single pass:
HBM traffic = read q,k,v + write o, nothing else.

Everything is compute on the VPU via broadcast-multiply-reduce — at t=18
the MXU would be idle anyway, and the op is purely bandwidth-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[...].astype(jnp.float32) * scale  # (bb, t, d)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    # (bb, t, t) logits; t is tiny so the broadcast stays in VMEM
    s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=-1)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.sum(p[:, :, :, None] * v[:, None, :, :], axis=2)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def temporal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       block_b: int = 32) -> jnp.ndarray:
    """q,k,v: (B, t, h, d) -> (B, t, h, d); softmax over the second t.

    Inference path (no custom VJP yet — training uses the XLA backend)."""
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)

    def reshape(x):  # head into the grid: (h*B, t, d)
        return x.transpose(2, 0, 1, 3).reshape(h * b, t, d)

    qf, kf, vf = reshape(q), reshape(k), reshape(v)
    n = h * b
    block = min(block_b, n)
    grid = (pl.cdiv(n, block),)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[pl.BlockSpec((block, t, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((block, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, d), q.dtype),
    )(qf, kf, vf)
    return out.reshape(h, b, t, d).transpose(1, 2, 0, 3)
