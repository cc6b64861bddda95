"""Temporal attention blocks (counterpart of sgm/modules/video_attention.py).

The V3D layout convention: video batches are ``(b*t, ...)`` with frames
fastest-varying.  Temporal attention operates per spatial location: each
pixel attends across the 18 orbit frames (video_attention.py:113-140).

TPU layout design (round 2): the reference (and our round-1 port)
rearranges ``((b t), s, c) -> ((b s), t, c)`` and back around every temporal
block — two full HBM transposes per block, and XLA lowers the resulting
huge batch of 18x18 attentions poorly (~96 ms/step total, see
benchmarks/profile_unet_step.py).  Here the block instead operates on the
FREE reshape ``(b, t, s, c)`` and:

- temporal self-attention projects straight into the fused kernel's
  (t, d, n) layout with einsums (the transpose rides the matmul epilogue)
  and runs ops.temporal_attention.temporal_core — a single-pass Pallas
  kernel on TPU;
- the cross-attention to the per-video time context keeps the context as
  (b, s_ctx, d) — the reference repeats it per-pixel
  (video_attention.py:244-253), a (b*h*w, 1, 1024) materialization that is
  pure bandwidth waste;
- ff_in / ff / LayerNorms are layout-agnostic (last-dim ops).

Everything is parameter-compatible with the reference checkpoint mapping
(children named attn1/attn2 with to_q/to_k/to_v/to_out kernels of identical
shapes), verified by tests/test_unet_parity*.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.attention_blocks import (
    BasicTransformerBlock,
    FeedForward,
)
from v3d_tpu.models.layers import (
    AlphaBlender,
    GroupNorm32,
    LayerNormF32,
    dense,
    timestep_embedding,
)
from v3d_tpu.ops.temporal_attention import (
    temporal_block_attention,
    temporal_core,
)


class _ProjParams(nn.Module):
    """Param container laid out exactly like nn.Dense (kernel (in, out)
    [+ bias]) so converted torch weights drop in, but applied by the caller
    with custom einsums for layout-fused projections."""

    in_features: int
    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class TemporalSelfAttention(nn.Module):
    """Self-attention over the frame axis of (b, t, s, c) tokens
    (attention.py:260-351 semantics, to_q/to_k/to_v no-bias + to_out),
    fused into ONE Pallas program on TPU: QKV projection (MXU), 18-frame
    attention per (pixel, head) with the batch in the VPU lanes, and the
    output projection — no HBM-level layout changes at all
    (ops.temporal_attention.temporal_block_attention)."""

    heads: int
    dim_head: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, t, s, c = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        dt = self.dtype or x.dtype
        wq, _ = _ProjParams(c, inner, name="to_q")()
        wk, _ = _ProjParams(c, inner, name="to_k")()
        wv, _ = _ProjParams(c, inner, name="to_v")()
        wo, bo = _ProjParams(inner, c, use_bias=True, name="to_out")()
        # the fused Pallas block unrolls heads x frames; Mosaic handles the
        # 5-head ds1 level (the expensive one) but chokes past ~8 heads
        if s % 64 == 0 and h <= 8:
            out = temporal_block_attention(
                x.astype(dt), wq.astype(dt), wk.astype(dt), wv.astype(dt),
                wo.astype(dt), bo.astype(dt), h)
            return out.astype(dt)

        # layout-fused fallback for odd spatial sizes
        n = b * s * h

        def proj(w):
            y = jnp.einsum("btsc,chd->tdbsh", x, w.reshape(c, h, dh).astype(dt))
            return y.reshape(t, dh, n)

        o = temporal_core(proj(wq), proj(wk), proj(wv))
        o = o.reshape(t, dh, b, s, h)
        out = jnp.einsum("tdbsh,hdc->btsc", o,
                         wo.reshape(h, dh, c).astype(dt))
        return out + bo.astype(dt)


class TemporalCrossAttention(nn.Module):
    """Cross-attention of (b, t, s, c) tokens to a per-video context
    (b, s_ctx, ctx_dim) — every frame/pixel attends to the same few context
    tokens (V3D: s_ctx=1, the first frame's CLIP embedding), so the context
    is NOT repeated per pixel."""

    heads: int
    dim_head: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context):
        b, t, s, c = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        dt = self.dtype or x.dtype
        wq, _ = _ProjParams(c, inner, name="to_q")()
        wk, _ = _ProjParams(context.shape[-1], inner, name="to_k")()
        wv, _ = _ProjParams(context.shape[-1], inner, name="to_v")()
        wo, bo = _ProjParams(inner, c, use_bias=True, name="to_out")()

        q = jnp.einsum("btsc,chd->btshd", x, wq.reshape(c, h, dh).astype(dt))
        k = jnp.einsum("bkc,chd->bkhd", context,
                       wk.reshape(-1, h, dh).astype(dt))
        v = jnp.einsum("bkc,chd->bkhd", context,
                       wv.reshape(-1, h, dh).astype(dt))
        logits = jnp.einsum("btshd,bkhd->btshk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / (dh ** 0.5)
        probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(dt)
        o = jnp.einsum("btshk,bkhd->btshd", probs, v)
        out = jnp.einsum("btshd,hdc->btsc", o, wo.reshape(h, dh, c).astype(dt))
        return out + bo.astype(dt)


class VideoTransformerBlock(nn.Module):
    """video_attention.py:15-144 — temporal transformer block.

    Input ((b t), s, c); attends over t per spatial position, with optional
    input FF ("ff_in") and cross-attention to the per-video time context
    (passed UNREPEATED as (b, s_ctx, d))."""

    heads: int
    dim_head: int
    num_frames: int
    ff_in: bool = True
    disable_self_attn: bool = False
    disable_temporal_crossattention: bool = False
    switch_temporal_ca_to_sa: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        bt, s, c = x.shape
        t = self.num_frames
        b = bt // t
        x = x.reshape(b, t, s, c)  # frames-major: free reshape

        inner = self.heads * self.dim_head
        is_res = inner == c
        assert not self.disable_self_attn, \
            "V3D always self-attends temporally (video_attention.py:70)"

        if self.ff_in:
            x_skip = x
            x = FeedForward(dim_out=inner, dtype=self.dtype, name="ff_in")(
                LayerNormF32(name="norm_in")(x))
            if is_res:
                x = x + x_skip

        x = TemporalSelfAttention(self.heads, self.dim_head, dtype=self.dtype,
                                  name="attn1")(
            LayerNormF32(name="norm1")(x)) + x

        if not self.disable_temporal_crossattention:
            y = LayerNormF32(name="norm2")(x)
            if self.switch_temporal_ca_to_sa or context is None:
                x = TemporalSelfAttention(self.heads, self.dim_head,
                                          dtype=self.dtype, name="attn2")(y) + x
            else:
                x = TemporalCrossAttention(self.heads, self.dim_head,
                                           dtype=self.dtype, name="attn2")(
                    y, context) + x

        x_skip = x
        x = FeedForward(dim_out=c, dtype=self.dtype, name="ff")(
            LayerNormF32(name="norm3")(x))
        if is_res:
            x = x + x_skip

        return x.reshape(bt, s, c)


class SpatialVideoTransformer(nn.Module):
    """video_attention.py:146-301 — spatial transformer with a parallel
    temporal stack, merged per-block by a learned AlphaBlender.

    Input (bt, h, w, c); ``context`` (bt, s_ctx, ctx_dim).  With
    ``use_spatial_context`` (V3D), the temporal cross-attention context is
    the first frame's spatial context per video (video_attention.py:244-253
    repeats it per pixel; we keep it (b, s_ctx, d) — same math, no copy).
    """

    heads: int
    dim_head: int
    num_frames: int
    depth: int = 1
    use_linear: bool = True
    use_spatial_context: bool = True
    ff_in: bool = True
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    disable_self_attn: bool = False
    disable_temporal_crossattention: bool = False
    max_time_embed_period: int = 10000
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, time_context=None,
                 image_only_indicator=None):
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        inner = self.heads * self.dim_head
        x_in = x

        spatial_context = context
        if self.use_spatial_context:
            assert context is not None and context.ndim == 3
            # first-frame context per video: (b, s_ctx, d)
            time_context = context[::t]
        elif time_context is not None:
            if time_context.ndim == 2:
                time_context = time_context[:, None, :]

        x = GroupNorm32(epsilon=1e-6, name="norm")(x)
        x = x.reshape(bt, h * w, c)
        x = dense(inner, dtype=self.dtype, name="proj_in")(x)

        # frame-index positional embedding (video_attention.py:266-276)
        frames = jnp.tile(jnp.arange(t, dtype=jnp.float32), b)
        t_emb = timestep_embedding(frames, c, max_period=self.max_time_embed_period)
        emb = dense(c * 4, dtype=self.dtype, name="time_pos_embed_0")(
            t_emb.astype(self.dtype or t_emb.dtype))
        emb = dense(c, dtype=self.dtype, name="time_pos_embed_2")(nn.silu(emb))
        emb = emb[:, None, :]

        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype, name=f"blocks_{i}")(x, spatial_context)
            x_mix = x + emb.astype(x.dtype)
            x_mix = VideoTransformerBlock(
                self.heads, self.dim_head, num_frames=t, ff_in=self.ff_in,
                disable_temporal_crossattention=self.disable_temporal_crossattention,
                dtype=self.dtype, name=f"time_stack_{i}")(x_mix, time_context)
            x = AlphaBlender(
                alpha=self.merge_factor, merge_strategy=self.merge_strategy,
                alpha_shape="btc", name="time_mixer")(
                    x_spatial=x, x_temporal=x_mix,
                    image_only_indicator=image_only_indicator)

        x = dense(c, dtype=self.dtype, zero_init=True, name="proj_out")(x)
        x = x.reshape(bt, h, w, c)
        return x + x_in
