"""Transformer blocks for the UNets (counterpart of sgm/modules/attention.py).

Token layout is (batch, seq, channels); the SpatialTransformer flattens NHWC
feature maps to tokens.  All LayerNorms/softmax run in f32; matmuls follow
the module compute dtype (bf16 in production).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.layers import LayerNormF32, dense, conv_nd, GroupNorm32
from v3d_tpu.ops.attention import attention, attention_bhsd

# Production default since r5: with layout "bhsd" the self-attention QKV
# projections emit (b, h, s, d) DIRECTLY from the projection einsum — the
# (b,s,h,d)->(b,h,s,d)/(bh,s,d) layout copies around the attention custom
# calls (~43 ms/step in the r4 trace) ride the matmul epilogue instead of
# standing as separate copy fusions (same trick as the temporal path,
# ops/temporal_attention.py header).  Param trees are IDENTICAL to the
# dense path (same names/shapes), so checkpoints and parity tests see no
# difference.  Full-generation A/B (generation_variants_r5.json): bhsd +
# stock-jax flash at both spatial levels = 11.38 s vs 11.71 s for the r4
# bshd routing; "bshd" stays one env var away for A/Bs.
_PROJ_LAYOUT = os.environ.get("V3D_ATTN_PROJ_LAYOUT") or "bhsd"


def set_proj_layout(name: str) -> None:
    global _PROJ_LAYOUT
    assert name in ("bshd", "bhsd")
    _PROJ_LAYOUT = name


class _QKVProjBHSD(nn.Module):
    """nn.Dense(inner, use_bias=False) with the head split + transpose
    folded into the projection einsum: (b,s,c) -> (b,h,s,dh).  Param tree
    matches dense(name=...): {"kernel": (c, h*dh)} in f32."""

    heads: int
    dim_head: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c, self.heads * self.dim_head), jnp.float32)
        dt = self.dtype or x.dtype
        w = kernel.astype(dt).reshape(c, self.heads, self.dim_head)
        return jnp.einsum("bsc,chd->bhsd", x.astype(dt), w)


class _OutProjBHSD(nn.Module):
    """nn.Dense(out_dim) consuming (b,h,s,dh) directly: the inverse
    head-merge rides the contraction.  Param tree matches dense(name=...):
    {"kernel": (h*dh, out), "bias": (out,)} in f32."""

    features: int
    heads: int
    dim_head: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, o):
        inner = self.heads * self.dim_head
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (inner, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype or o.dtype
        w = kernel.astype(dt).reshape(self.heads, self.dim_head,
                                      self.features)
        return (jnp.einsum("bhsd,hdc->bsc", o.astype(dt), w)
                + bias.astype(dt))


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
        # the bhsd layout only pays where the flash kernels run (>=1024
        # tokens, d=64 self-attention); tiny/cross shapes stay on the
        # dense + (b,s,h,d) path
        if (_PROJ_LAYOUT == "bhsd" and context is None
                and self.dim_head == 64 and x.shape[1] >= 1024):
            q = _QKVProjBHSD(self.heads, self.dim_head, dtype=self.dtype,
                             name="to_q")(x)
            k = _QKVProjBHSD(self.heads, self.dim_head, dtype=self.dtype,
                             name="to_k")(ctx)
            v = _QKVProjBHSD(self.heads, self.dim_head, dtype=self.dtype,
                             name="to_v")(ctx)
            out = attention_bhsd(q, k, v)
            return _OutProjBHSD(out_dim, self.heads, self.dim_head,
                                dtype=self.dtype, name="to_out")(out)
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
