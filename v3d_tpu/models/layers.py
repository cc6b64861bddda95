"""Shared NN building blocks for the diffusion UNets (TPU layout: NHWC).

Counterparts of sgm/modules/diffusionmodules/util.py and openaimodel.py.
Design notes for the TPU port:

- Layout is NHWC / NDHWC (channels-last) so convolutions hit the MXU without
  layout transposes; the reference is NCHW.
- Normalizations always compute in float32 regardless of the compute dtype
  (GroupNorm32 semantics, util.py:274-277) — this is what keeps bf16 UNet
  evaluation numerically close to the f32 reference.
- Stride-2 convolutions use explicit symmetric (1,1) padding to match torch's
  ``padding=1`` (XLA 'SAME' pads asymmetrically at stride 2).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = jnp.dtype


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000,
                       repeat_only: bool = False) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-first (diffusionmodules/util.py:207-231)."""
    if repeat_only:
        return jnp.repeat(timesteps[:, None], dim, axis=-1)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class ChannelPartialGroupNorm(nn.Module):
    """GroupNorm with a TPU-shaped statistics pass (+ optional fused act).

    flax's nn.GroupNorm reshapes to (..., G, C/G) and reduces over the C/G
    minor slice — a 10-wide group straddles the 128-wide lane dim at ~8%
    efficiency.  The math lives in ops/fused_groupnorm: per-channel
    moments with channels on lanes, group-combined on (B, C) partials —
    evaluated by the XLA formula by default (the on-chip A/B in
    benchmarks/results/gn_bench_r4.json showed standalone XLA GN already
    bandwidth-bound; the trace's convert_reduce fusions are conv+GN-stat
    fusions with the convs inside, ARCHITECTURE.md §4b).  The Pallas
    two-pass kernels remain opt-in via V3D_GN_BACKEND for layout A/Bs.
    ``act="silu"`` requests a fused SiLU epilogue where the backend
    supports it (the XLA default applies SiLU as a separate op — fusing it
    into the GN f32 epilogue regressed full generation 11.70 -> 11.92 s).
    Param tree matches nn.GroupNorm (scale/bias of (C,))."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from v3d_tpu.ops.fused_groupnorm import group_norm_act

        G = self.num_groups
        C = x.shape[-1]
        assert C % G == 0, (C, G)
        assert self.act in (None, "silu"), self.act
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm_act(x, scale, bias, G, self.epsilon,
                              self.act == "silu")


class GroupNorm32(nn.Module):
    """GroupNorm(32) evaluated in f32, output cast back to input dtype,
    with an optional fused SiLU epilogue (``act="silu"``).
    Inner module named GroupNorm_0 keeps the param tree identical to the
    previous nn.GroupNorm delegation (core/convert.py:55,437)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = ChannelPartialGroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, act=self.act,
            name="GroupNorm_0")(x)
        return out.astype(dtype)


class LayerNormF32(nn.Module):
    """LayerNorm evaluated in f32 (torch nn.LayerNorm default eps 1e-5)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                           param_dtype=jnp.float32)(x.astype(jnp.float32))
        return out.astype(dtype)


# --- skip-concat conv splitting -------------------------------------------
# The UNet decoder's first conv per block consumes concat([h, skip]) — the r4
# xplane trace shows XLA's 640->320 ds1 emitter at ~43% MFU while square
# 320->320 convs run ~70% (ARCHITECTURE.md §4b).  conv is linear in input
# channels, so conv(concat(a, b), W) == conv(a, W[..., :c1, :]) +
# conv(b, W[..., c1:, :]) EXACTLY — two square convs on the good emitter.
# Routing: "0" (off) / "ds1" (only the 640->320 blocks) / "all"; settable for
# full-generation A/Bs (benchmarks/generation_variants.py) like the attention
# backends.
import os as _os

_SPLIT_SKIP_CONV = _os.environ.get("V3D_SPLIT_SKIP_CONV", "0")


def set_split_skip_conv(mode: str) -> None:
    """Set skip-concat conv splitting: "0" | "ds1" | "all" (trace-time)."""
    global _SPLIT_SKIP_CONV
    assert mode in ("0", "ds1", "all"), mode
    _SPLIT_SKIP_CONV = mode


def split_skip_conv_mode() -> str:
    return _SPLIT_SKIP_CONV


class SplitInputConv2D(nn.Module):
    """A 2D conv evaluated as two input-channel slabs sharing ONE kernel.

    Param tree ({kernel, bias}, f32, HWIO) is identical to nn.Conv so
    checkpoints/converters are unaffected; only the emitted HLO differs:
    two convs (x[..., :split] and x[..., split:]) summed, which is exact
    because convolution is linear in the input channels."""

    features: int
    kernel_size: Tuple[int, int]
    split: int
    padding: Sequence[Tuple[int, int]]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        assert 0 < self.split < cin, (self.split, cin)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        x = x.astype(dt)
        k = kernel.astype(dt)
        dn = jax.lax.conv_dimension_numbers(
            (x.shape[0], x.shape[1], x.shape[2], self.split),
            (kh, kw, self.split, self.features), ("NHWC", "HWIO", "NHWC"))
        pad = [tuple(p) for p in self.padding]
        out = jax.lax.conv_general_dilated(
            x[..., :self.split], k[:, :, :self.split, :], (1, 1), pad,
            dimension_numbers=dn)
        out = out + jax.lax.conv_general_dilated(
            x[..., self.split:], k[:, :, self.split:, :], (1, 1), pad,
            dimension_numbers=dn)
        return out + bias.astype(dt)


def conv_nd(features: int, kernel_size, *, strides=None, padding="SAME",
            dtype=None, zero_init: bool = False, name: Optional[str] = None):
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    bias_init = nn.initializers.zeros
    return nn.Conv(
        features=features,
        kernel_size=tuple(kernel_size),
        strides=strides,
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        bias_init=bias_init,
        name=name,
    )


def dense(features: int, *, use_bias: bool = True, dtype=None,
          zero_init: bool = False, name: Optional[str] = None):
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, kernel_init=kernel_init, name=name)


class AlphaBlender(nn.Module):
    """Spatial/temporal mixing (diffusionmodules/util.py:312-369).

    ``merge_strategy``:
      - "fixed": constant alpha
      - "learned": sigmoid(learned scalar)
      - "learned_with_images": per-(batch, frame) — alpha forced to 1
        (spatial-only) where ``image_only_indicator`` is set, else
        sigmoid(learned scalar).

    ``alpha_shape`` controls broadcasting of the (b, t) alpha:
      - "btc": tokens laid out ((b t), s, c) -> alpha ((b t), 1, 1)
      - "bthwc": video laid out (b, t, h, w, c) -> alpha (b, t, 1, 1, 1)
    """

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    alpha_shape: str = "btc"

    @nn.compact
    def __call__(self, x_spatial, x_temporal, image_only_indicator=None):
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.alpha, jnp.float32)
        elif self.merge_strategy in ("learned", "learned_with_images"):
            mix = self.param("mix_factor", lambda k: jnp.asarray([self.alpha], jnp.float32))
            alpha = jax.nn.sigmoid(mix[0])
        else:
            raise ValueError(f"unknown merge strategy {self.merge_strategy}")

        if self.merge_strategy == "learned_with_images":
            if image_only_indicator is None:
                raise ValueError("learned_with_images needs image_only_indicator")
            alpha = jnp.where(image_only_indicator.astype(bool), 1.0, alpha)  # (b, t)
            if self.alpha_shape == "btc":
                alpha = alpha.reshape(-1)[:, None, None]          # ((b t), 1, 1)
            elif self.alpha_shape == "bthwc":
                alpha = alpha[:, :, None, None, None]              # (b, t, 1, 1, 1)
            else:
                raise ValueError(self.alpha_shape)

        alpha = jnp.asarray(alpha, x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class Upsample(nn.Module):
    """Nearest x2 upsample + conv (openaimodel.py:117-168)."""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # x: (b, h, w, c)
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = conv_nd(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv downsample (openaimodel.py:170-218)."""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv_nd(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """GN-SiLU-conv ResBlock with timestep-embedding bias
    (openaimodel.py:220-365).

    ``dims=2`` operates on (b, h, w, c); ``dims=3`` on (b, t, h, w, c) with
    ``kernel_size`` like (3, 1, 1) giving a temporal-only conv.
    ``exchange_temb_dims``: emb arrives (b, t, c) and is broadcast per-frame
    over (b, t, h, w, c) (openaimodel.py:355-360).
    """

    out_channels: int
    dims: int = 2
    kernel_size: Union[int, Sequence[int]] = 3
    use_scale_shift_norm: bool = False
    exchange_temb_dims: bool = False
    skip_t_emb: bool = False
    up: bool = False
    down: bool = False
    dtype: Optional[Dtype] = None
    # Channel count of the first slab when the input is concat([h, skip]);
    # lets in_conv run as two square convs (SplitInputConv2D) when the
    # split-skip-conv routing is on.  None = plain conv.
    in_split: Optional[int] = None

    @nn.compact
    def __call__(self, x, emb):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks,) * (self.dims)
        ks = tuple(ks)
        pad = [(k // 2, k // 2) for k in ks]

        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if (self.in_split is not None and self.dims == 2
                and not (self.up or self.down)):
            h = SplitInputConv2D(self.out_channels, ks, self.in_split, pad,
                                 dtype=self.dtype, name="in_conv")(h)
        else:
            h = conv_nd(self.out_channels, ks, padding=pad, dtype=self.dtype,
                        name="in_conv")(h)

        if not self.skip_t_emb:
            emb_ch = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
            emb_out = dense(emb_ch, dtype=self.dtype, name="emb_linear")(nn.silu(emb))
            emb_out = emb_out.astype(h.dtype)
            if self.exchange_temb_dims:
                # emb: (b, t, c) -> broadcast over (b, t, h, w, c)
                emb_out = emb_out[:, :, None, None, :]
            else:
                # emb: (n, c) -> broadcast over trailing spatial dims
                emb_out = emb_out.reshape(
                    emb_out.shape[:1] + (1,) * (h.ndim - 2) + emb_out.shape[-1:]
                )
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            if not self.skip_t_emb:
                h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
            h = nn.silu(h)
        h = conv_nd(self.out_channels, ks, padding=pad, dtype=self.dtype,
                    zero_init=True, name="out_conv")(h)

        if x.shape[-1] != self.out_channels:
            x = conv_nd(self.out_channels, (1,) * self.dims, dtype=self.dtype,
                        name="skip_conv")(x)
        return x + h


def _nearest_up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
