"""Transformer blocks for the UNets (counterpart of sgm/modules/attention.py).

Token layout is (batch, seq, channels); the SpatialTransformer flattens NHWC
feature maps to tokens.  All LayerNorms/softmax run in f32; matmuls follow
the module compute dtype (bf16 in production).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.layers import LayerNormF32, dense, conv_nd, GroupNorm32
from v3d_tpu.ops.attention import attention


class CrossAttention(nn.Module):
    """attention.py:260-351 — MHA with no-bias QKV and linear out.
    Self-attention when ``context`` is None."""

    heads: int
    dim_head: int
    query_dim: Optional[int] = None  # output dim (defaults to inner dim)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        out_dim = self.query_dim if self.query_dim is not None else x.shape[-1]
        ctx = x if context is None else context
        q = dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        out = attention(q, k, v).reshape(b, sq, inner)
        return dense(out_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    """attention.py:102-118 — GEGLU MLP with 4x expansion."""

    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        out = self.dim_out if self.dim_out is not None else dim
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        else:
            x = dense(inner, dtype=self.dtype, name="net_0")(x)
            x = nn.gelu(x)
        return dense(out, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """attention.py:461-560 — self-attn, cross-attn, GEGLU FF (pre-norm)."""

    heads: int
    dim_head: int
    disable_self_attn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        sa_ctx = context if self.disable_self_attn else None
        x = CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                           name="attn1")(LayerNormF32(name="norm1")(x), sa_ctx) + x
        x = CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                           name="attn2")(LayerNormF32(name="norm2")(x), context) + x
        x = FeedForward(dtype=self.dtype, name="ff")(LayerNormF32(name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """attention.py:624-764 — GroupNorm -> proj_in -> blocks -> proj_out(+res).

    Input (b, h, w, c); context (b, s_ctx, context_dim).
    """

    heads: int
    dim_head: int
    depth: int = 1
    use_linear: bool = True
    disable_self_attn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        if not self.use_linear:
            x = conv_nd(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, x.shape[-1])
        if self.use_linear:
            x = dense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, disable_self_attn=self.disable_self_attn,
                dtype=self.dtype, name=f"blocks_{i}")(x, context)
        if self.use_linear:
            x = dense(c, dtype=self.dtype, zero_init=True, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = conv_nd(c, (1, 1), dtype=self.dtype, zero_init=True,
                        name="proj_out")(x)
        return x + x_in
