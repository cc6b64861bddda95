"""Temporal attention blocks (counterpart of sgm/modules/video_attention.py).

The V3D layout convention: video batches are ``(b*t, ...)`` with frames
fastest-varying.  Temporal attention operates per spatial location: tokens
``((b t), s, c)`` are rearranged to ``((b s), t, c)`` so each pixel attends
across the 18 orbit frames (video_attention.py:113-140).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.attention_blocks import (
    BasicTransformerBlock,
    CrossAttention,
    FeedForward,
)
from v3d_tpu.models.layers import (
    AlphaBlender,
    GroupNorm32,
    LayerNormF32,
    dense,
    timestep_embedding,
)


class VideoTransformerBlock(nn.Module):
    """video_attention.py:15-144 — temporal transformer block.

    Input ((b t), s, c); attends over t per spatial position, with optional
    input FF ("ff_in") and cross-attention to the per-video time context.
    """

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
        # ((b t), s, c) -> ((b s), t, c)
        x = x.reshape(b, t, s, c).transpose(0, 2, 1, 3).reshape(b * s, t, c)

        inner = self.heads * self.dim_head
        is_res = inner == c

        if self.ff_in:
            x_skip = x
            x = FeedForward(dim_out=inner, dtype=self.dtype, name="ff_in")(
                LayerNormF32(name="norm_in")(x))
            if is_res:
                x = x + x_skip

        sa_ctx = context if self.disable_self_attn else None
        x = CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                           name="attn1")(LayerNormF32(name="norm1")(x), sa_ctx) + x

        if not self.disable_temporal_crossattention:
            ca_ctx = None if self.switch_temporal_ca_to_sa else context
            x = CrossAttention(self.heads, self.dim_head, dtype=self.dtype,
                               name="attn2")(LayerNormF32(name="norm2")(x), ca_ctx) + x

        x_skip = x
        x = FeedForward(dim_out=c, dtype=self.dtype, name="ff")(
            LayerNormF32(name="norm3")(x))
        if is_res:
            x = x + x_skip

        # ((b s), t, c) -> ((b t), s, c)
        x = x.reshape(b, s, t, c).transpose(0, 2, 1, 3).reshape(bt, s, c)
        return x


class SpatialVideoTransformer(nn.Module):
    """video_attention.py:146-301 — spatial transformer with a parallel
    temporal stack, merged per-block by a learned AlphaBlender.

    Input (bt, h, w, c); ``context`` (bt, s_ctx, ctx_dim).  With
    ``use_spatial_context`` (V3D), the temporal cross-attention context is the
    first frame's spatial context repeated per pixel
    (video_attention.py:244-253).
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
            # first-frame context per video, repeated per spatial location:
            # (b, s_ctx, d) -> ((b h w), s_ctx, d)
            tc0 = context[::t]
            time_context = jnp.repeat(tc0, h * w, axis=0)
        elif time_context is not None:
            time_context = jnp.repeat(time_context, h * w, axis=0)
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
