"""CLIP vision transformer (ViT-H/14 visual tower) in flax.

TPU-native port of the open_clip VisionTransformer used by the reference's
FrozenOpenCLIPImageEmbedder (sgm/modules/encoders/modules.py:594-680):
patchify conv -> [cls] + pos embed -> ln_pre -> 32 pre-norm blocks ->
ln_post -> take cls token -> projection to embed_dim.

ViT-H/14: width 1280, 32 layers, 16 heads, patch 14, image 224, proj 1024.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.core.registry import register
from v3d_tpu.models.layers import LayerNormF32, dense
from v3d_tpu.ops.attention import attention

# CLIP normalization constants (modules.py:631-636)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent: packed qkv with bias."""

    heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        d = c // self.heads
        qkv = dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.heads, d)
        k = k.reshape(b, s, self.heads, d)
        v = v.reshape(b, s, self.heads, d)
        out = attention(q, k, v).reshape(b, s, c)
        return dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    heads: int
    mlp_ratio: float = 4.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = x + CLIPAttention(self.heads, dtype=self.dtype, name="attn")(
            LayerNormF32(name="ln_1")(x))
        h = LayerNormF32(name="ln_2")(x)
        h = dense(int(c * self.mlp_ratio), dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = dense(c, dtype=self.dtype, name="c_proj")(h)
        return x + h


@register("clip_vit")
class CLIPVisionTransformer(nn.Module):
    """Input: (n, 224, 224, 3) already CLIP-normalized.  Output: pooled
    (n, output_dim) embedding (and optionally the patch tokens)."""

    width: int = 1280
    layers: int = 32
    heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    output_dim: int = 1024
    output_tokens: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(
                        x.astype(self.dtype or x.dtype))
        x = x.reshape(n, -1, self.width)  # (n, grid*grid, width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (self.width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (x.shape[1] + 1, self.width))
        cls_tok = jnp.broadcast_to(cls.astype(x.dtype), (n, 1, self.width))
        x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos.astype(x.dtype)[None]
        x = LayerNormF32(name="ln_pre")(x)
        for i in range(self.layers):
            x = CLIPBlock(self.heads, dtype=self.dtype, name=f"resblocks_{i}")(x)
        x = LayerNormF32(name="ln_post")(x)
        pooled, tokens = x[:, 0], x[:, 1:]
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim))
        pooled = pooled @ proj.astype(pooled.dtype)
        if self.output_tokens:
            return pooled, tokens
        return pooled


def clip_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """modules.py:644-656: resize [-1,1] images to 224 (bicubic, antialias),
    rescale to [0,1], renormalize with CLIP mean/std.  Input (n, h, w, 3)."""
    n, h, w, c = x.shape
    if (h, w) != (224, 224):
        x = jax.image.resize(x, (n, 224, 224, c), method="bicubic", antialias=True)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std
