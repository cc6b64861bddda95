"""VideoUNet — the V3D generator (counterpart of
sgm/modules/diffusionmodules/video_model.py).

TPU design notes:
- NHWC layout throughout; batch is ``(b*t)`` with frames fastest-varying.
- ``num_video_frames`` is a static Python int (fixed at trace time) — all
  temporal rearranges become static reshapes that XLA folds away.
- The heavy per-block compute can be rematerialized (``use_checkpoint``) to
  trade FLOPs for HBM, mirroring the reference's gradient checkpointing.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.core.registry import register
from v3d_tpu.models.layers import (
    AlphaBlender,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    conv_nd,
    dense,
    timestep_embedding,
)
from v3d_tpu.models.video_attention import SpatialVideoTransformer


class VideoResBlock(nn.Module):
    """2D ResBlock followed by a temporal (3,1,1)-conv ResBlock, merged by a
    learned AlphaBlender (video_model.py:12-81)."""

    out_channels: int
    num_frames: int
    video_kernel_size: Sequence[int] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    use_scale_shift_norm: bool = False
    dtype: Optional[jnp.dtype] = None
    in_split: Optional[int] = None  # see layers.ResBlock.in_split

    @nn.compact
    def __call__(self, x, emb, image_only_indicator=None):
        # x: ((b t), h, w, c); emb: ((b t), emb_ch)
        x = ResBlock(self.out_channels, dims=2,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, in_split=self.in_split,
                     name="spatial")(x, emb)
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        x5 = x.reshape(b, t, h, w, c)
        emb5 = emb.reshape(b, t, emb.shape[-1])
        x_temporal = ResBlock(
            self.out_channels, dims=3, kernel_size=tuple(self.video_kernel_size),
            exchange_temb_dims=True, dtype=self.dtype, name="time_stack",
        )(x5, emb5)
        x5 = AlphaBlender(
            alpha=self.merge_factor, merge_strategy=self.merge_strategy,
            alpha_shape="bthwc", name="time_mixer",
        )(x_spatial=x5, x_temporal=x_temporal,
          image_only_indicator=image_only_indicator)
        return x5.reshape(bt, h, w, c)


def unet_layer_specs(model_channels: int, channel_mult: Sequence[int],
                     num_res_blocks: int, attention_resolutions: Sequence[int],
                     num_head_channels: int):
    """Shared skeleton walk for VideoUNet construction and the torch weight
    converter: returns (input_specs, middle_spec, output_specs) where each
    block is a list of layer descriptors."""
    input_specs = [[("conv_in", model_channels)]]
    input_chans = [model_channels]
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            layers = [("res", mult * model_channels)]
            ch = mult * model_channels
            if ds in attention_resolutions:
                layers.append(("attn", ch, ch // num_head_channels))
            input_specs.append(layers)
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            ds *= 2
            input_specs.append([("down", ch)])
            input_chans.append(ch)
    middle_spec = [("res", ch), ("attn", ch, ch // num_head_channels), ("res", ch)]
    output_specs = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            ich = input_chans.pop()
            layers = [("res", model_channels * mult, ich)]
            ch = model_channels * mult
            if ds in attention_resolutions:
                layers.append(("attn", ch, ch // num_head_channels))
            if level and i == num_res_blocks:
                ds //= 2
                layers.append(("up", ch))
            output_specs.append(layers)
    return input_specs, middle_spec, output_specs


@register("video_unet")
class VideoUNet(nn.Module):
    """video_model.py:84-493 with V3D_512.yaml defaults.

    __call__(x, timesteps, context, y, num_video_frames, image_only_indicator)
      x:        ((b t), h, w, in_channels)   latent + concat-cond channels
      timesteps:((b t),)                      c_noise values
      context:  ((b t), s_ctx, context_dim)   CLIP crossattn tokens
      y:        ((b t), adm_in_channels)      vector cond (fps/motion/aug)
    """

    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    adm_in_channels: Optional[int] = 768
    use_scale_shift_norm: bool = False
    video_kernel_size: Sequence[int] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    extra_ff_mix_layer: bool = True
    use_spatial_context: bool = True
    use_linear_in_transformer: bool = True
    disable_temporal_crossattention: bool = False
    max_ddpm_temb_period: int = 10000
    use_checkpoint: bool = False
    dtype: Optional[jnp.dtype] = None

    def _res(self, out_ch, t, name, in_split=None):
        cls = VideoResBlock
        if self.use_checkpoint:
            cls = nn.remat(cls)
        return cls(out_channels=out_ch, num_frames=t,
                   video_kernel_size=tuple(self.video_kernel_size),
                   merge_strategy=self.merge_strategy,
                   merge_factor=self.merge_factor,
                   use_scale_shift_norm=self.use_scale_shift_norm,
                   dtype=self.dtype, in_split=in_split, name=name)

    def _attn(self, ch, heads, t, name):
        cls = SpatialVideoTransformer
        if self.use_checkpoint:
            cls = nn.remat(cls)
        return cls(heads=heads, dim_head=self.num_head_channels, num_frames=t,
                   depth=self.transformer_depth,
                   use_linear=self.use_linear_in_transformer,
                   use_spatial_context=self.use_spatial_context,
                   ff_in=self.extra_ff_mix_layer,
                   merge_strategy=self.merge_strategy,
                   merge_factor=self.merge_factor,
                   disable_temporal_crossattention=self.disable_temporal_crossattention,
                   max_time_embed_period=self.max_ddpm_temb_period,
                   dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, timesteps, context=None, y=None, time_context=None,
                 num_video_frames: int = 1, image_only_indicator=None):
        t = num_video_frames
        specs_in, spec_mid, specs_out = unet_layer_specs(
            self.model_channels, self.channel_mult, self.num_res_blocks,
            self.attention_resolutions, self.num_head_channels)

        # timestep + vector conditioning
        t_emb = timestep_embedding(timesteps, self.model_channels)
        t_emb = t_emb.astype(self.dtype or t_emb.dtype)
        emb = dense(self.model_channels * 4, dtype=self.dtype,
                    name="time_embed_0")(t_emb)
        emb = dense(self.model_channels * 4, dtype=self.dtype,
                    name="time_embed_2")(nn.silu(emb))
        if self.adm_in_channels is not None:
            assert y is not None and y.shape[0] == x.shape[0]
            y_emb = dense(self.model_channels * 4, dtype=self.dtype,
                          name="label_emb_0")(y.astype(emb.dtype))
            y_emb = dense(self.model_channels * 4, dtype=self.dtype,
                          name="label_emb_2")(nn.silu(y_emb))
            emb = emb + y_emb

        def apply_layers(h, layers, prefix, in_split=None):
            for li, spec in enumerate(layers):
                kind = spec[0]
                name = f"{prefix}_{li}"
                if kind == "conv_in":
                    h = conv_nd(spec[1], (3, 3), dtype=self.dtype, name=name)(h)
                elif kind == "res":
                    h = self._res(spec[1], t, name,
                                  in_split=in_split if li == 0 else None)(
                        h, emb, image_only_indicator)
                elif kind == "attn":
                    h = self._attn(spec[1], spec[2], t, name)(
                        h, context, time_context, image_only_indicator)
                elif kind == "down":
                    h = Downsample(spec[1], dtype=self.dtype, name=name)(h)
                elif kind == "up":
                    h = Upsample(spec[1], dtype=self.dtype, name=name)(h)
                else:
                    raise ValueError(kind)
            return h

        h = x.astype(self.dtype or x.dtype)
        hs = []
        for bi, layers in enumerate(specs_in):
            h = apply_layers(h, layers, f"in_{bi}")
            hs.append(h)
        h = apply_layers(h, spec_mid, "mid")
        from v3d_tpu.models.layers import split_skip_conv_mode
        split_mode = split_skip_conv_mode()
        for bi, layers in enumerate(specs_out):
            c1 = h.shape[-1]
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            # Route the decoder's concat-input conv through two square convs
            # where XLA's single-conv emitter is the bottleneck
            # (ARCHITECTURE.md §4b: ds1 640->320 at ~43% MFU).
            want_split = split_mode == "all" or (
                split_mode == "ds1" and layers[0][1] == self.model_channels)
            h = apply_layers(h, layers, f"out_{bi}",
                             in_split=c1 if want_split else None)

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = conv_nd(self.out_channels, (3, 3), dtype=self.dtype, zero_init=True,
                    name="out_conv")(h)
        return h.astype(jnp.float32)
