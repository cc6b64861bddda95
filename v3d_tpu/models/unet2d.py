"""Image (2D) UNet — the SD/SDXL generator family (counterpart of
sgm/modules/diffusionmodules/openaimodel.py:482-863 UNetModel), used by
sgm.models.diffusion.DiffusionEngine for the image pipelines the upstream
codebase ships alongside V3D.

Shares all building blocks with the VideoUNet; this is the spatial-only
variant (plain ResBlocks + SpatialTransformer, no temporal stacks)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.core.registry import register
from v3d_tpu.models.attention_blocks import SpatialTransformer
from v3d_tpu.models.layers import (
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    conv_nd,
    dense,
    timestep_embedding,
)
from v3d_tpu.models.video_unet import unet_layer_specs


@register("unet2d")
class UNetModel(nn.Module):
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: Optional[int] = 1024
    adm_in_channels: Optional[int] = None
    use_scale_shift_norm: bool = False
    use_linear_in_transformer: bool = True
    use_checkpoint: bool = False
    dtype: Optional[jnp.dtype] = None

    def _res(self, out_ch, name):
        cls = nn.remat(ResBlock) if self.use_checkpoint else ResBlock
        return cls(out_channels=out_ch,
                   use_scale_shift_norm=self.use_scale_shift_norm,
                   dtype=self.dtype, name=name)

    def _attn(self, ch, heads, name):
        cls = (nn.remat(SpatialTransformer) if self.use_checkpoint
               else SpatialTransformer)
        return cls(heads=heads, dim_head=self.num_head_channels,
                   depth=self.transformer_depth,
                   use_linear=self.use_linear_in_transformer,
                   dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, timesteps, context=None, y=None):
        specs_in, spec_mid, specs_out = unet_layer_specs(
            self.model_channels, self.channel_mult, self.num_res_blocks,
            self.attention_resolutions, self.num_head_channels)

        t_emb = timestep_embedding(timesteps, self.model_channels)
        t_emb = t_emb.astype(self.dtype or t_emb.dtype)
        emb = dense(self.model_channels * 4, dtype=self.dtype,
                    name="time_embed_0")(t_emb)
        emb = dense(self.model_channels * 4, dtype=self.dtype,
                    name="time_embed_2")(nn.silu(emb))
        if self.adm_in_channels is not None:
            assert y is not None
            y_emb = dense(self.model_channels * 4, dtype=self.dtype,
                          name="label_emb_0")(y.astype(emb.dtype))
            y_emb = dense(self.model_channels * 4, dtype=self.dtype,
                          name="label_emb_2")(nn.silu(y_emb))
            emb = emb + y_emb

        def apply_layers(h, layers, prefix):
            for li, spec in enumerate(layers):
                kind = spec[0]
                name = f"{prefix}_{li}"
                if kind == "conv_in":
                    h = conv_nd(spec[1], (3, 3), dtype=self.dtype, name=name)(h)
                elif kind == "res":
                    h = self._res(spec[1], name)(h, emb)
                elif kind == "attn":
                    h = self._attn(spec[1], spec[2], name)(h, context)
                elif kind == "down":
                    h = Downsample(spec[1], dtype=self.dtype, name=name)(h)
                elif kind == "up":
                    h = Upsample(spec[1], dtype=self.dtype, name=name)(h)
            return h

        h = x.astype(self.dtype or x.dtype)
        hs = []
        for bi, layers in enumerate(specs_in):
            h = apply_layers(h, layers, f"in_{bi}")
            hs.append(h)
        h = apply_layers(h, spec_mid, "mid")
        for bi, layers in enumerate(specs_out):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = apply_layers(h, layers, f"out_{bi}")
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        return conv_nd(self.out_channels, (3, 3), dtype=self.dtype,
                       zero_init=True, name="out_conv")(h).astype(jnp.float32)
