"""VAE encoder/decoder + temporal video decoder (NHWC).

Counterparts of sgm/modules/diffusionmodules/model.py (Encoder :487,
Decoder :604, ResnetBlock :144, AttnBlock :161) and
sgm/modules/autoencoding/temporal_ae.py (VideoResBlock :18, AE3DConv :86,
VideoDecoder :293 in "conv-only" time mode — V3D's configuration).

V3D recipe (scripts/pub/configs/V3D_512.yaml first_stage_config): ch=128,
ch_mult=[1,2,4,4], 2 res blocks, no down-path attention, mid attention,
z_channels=4 (double_z), temporal decoder with video_kernel_size [3,1,1].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.core.registry import register
from v3d_tpu.models.layers import ResBlock as UNetResBlock
from v3d_tpu.models.layers import conv_nd, dense
from v3d_tpu.ops.attention import attention


class VAEGroupNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) in f32 (model.py:52-56), with an optional
    SiLU epilogue.  Lowered through ops/fused_groupnorm (XLA formula by
    default per the gn_bench_r4 A/B; Pallas opt-in); the inner
    ChannelPartialGroupNorm is named GroupNorm_0 so the param tree matches
    the previous nn.GroupNorm delegation."""

    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from v3d_tpu.models.layers import ChannelPartialGroupNorm

        dtype = x.dtype
        out = ChannelPartialGroupNorm(
            num_groups=32, epsilon=1e-6, act=self.act,
            name="GroupNorm_0")(x)
        return out.astype(dtype)


class ResnetBlock(nn.Module):
    """model.py:144-186: GN-swish-conv x2 with 1x1 ("nin") shortcut."""

    out_channels: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        h = VAEGroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = conv_nd(out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = VAEGroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = conv_nd(out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = conv_nd(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """model.py:161-203: single-head full self-attention over h*w tokens;
    q/k/v/proj_out are 1x1 convs in torch, equivalent dense layers here."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h_ = VAEGroupNorm(name="norm")(x)
        q = dense(c, dtype=self.dtype, name="q")(h_)
        k = dense(c, dtype=self.dtype, name="k")(h_)
        v = dense(c, dtype=self.dtype, name="v")(h_)
        q = q.reshape(b, h * w, 1, c)
        k = k.reshape(b, h * w, 1, c)
        v = v.reshape(b, h * w, 1, c)
        out = attention(q, k, v).reshape(b, h, w, c)
        out = dense(c, dtype=self.dtype, name="proj_out")(out)
        return x + out


class DownsampleVAE(nn.Module):
    """model.py:73-90: stride-2 conv with asymmetric (0,1) right/bottom pad."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv_nd(x.shape[-1], (3, 3), strides=(2, 2),
                       padding=[(0, 1), (0, 1)], dtype=self.dtype, name="conv")(x)


class UpsampleVAE(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv_nd(x.shape[-1], (3, 3), dtype=self.dtype, name="conv")(x)


@register("vae_encoder")
class Encoder(nn.Module):
    """model.py:487-604.  Input (n, H, W, 3) in [-1, 1]; output
    (n, H/8, W/8, 2*z_channels) moments when double_z."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = conv_nd(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype or x.dtype))
        curr_res = self.resolution
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = DownsampleVAE(dtype=self.dtype, name=f"down_{i}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = VAEGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return conv_nd(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class VideoResBlockAE(nn.Module):
    """temporal_ae.py:18-84: spatial ResnetBlock + temporal (3,1,1) ResBlock
    merged by sigmoid(mix_factor) (alpha weights the *temporal* branch)."""

    out_channels: Optional[int] = None
    num_frames: int = 1
    video_kernel_size: Sequence[int] = (3, 1, 1)
    alpha: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.out_channels, dtype=self.dtype, name="spatial")(x)
        bt, h, w, c = x.shape
        t = self.num_frames
        b = bt // t
        x5 = x.reshape(b, t, h, w, c)
        x_temporal = UNetResBlock(
            c, dims=3, kernel_size=tuple(self.video_kernel_size), skip_t_emb=True,
            dtype=self.dtype, name="time_stack")(x5, None)
        mix = self.param("mix_factor", lambda k: jnp.asarray([self.alpha], jnp.float32))
        a = jax.nn.sigmoid(mix[0]).astype(x.dtype)
        x5 = a * x_temporal + (1.0 - a) * x5
        return x5.reshape(bt, h, w, c)


class AE3DConv(nn.Module):
    """temporal_ae.py:86-108: 2D conv then temporal 3D conv."""

    out_channels: int
    num_frames: int = 1
    video_kernel_size: Sequence[int] = (3, 1, 1)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = conv_nd(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)
        bt, h, w, c = x.shape
        t = self.num_frames
        x5 = x.reshape(bt // t, t, h, w, c)
        ks = tuple(self.video_kernel_size)
        pad = [(k // 2, k // 2) for k in ks]
        x5 = conv_nd(self.out_channels, ks, padding=pad, dtype=self.dtype,
                     name="time_mix_conv")(x5)
        return x5.reshape(bt, h, w, c)


class DecoderBase(nn.Module):
    """model.py:604-748 skeleton, shared by Decoder and VideoDecoder."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    dtype: Optional[jnp.dtype] = None

    # --- hooks overridden by VideoDecoder ---
    def make_resblock(self, out_ch, name):
        return ResnetBlock(out_ch, dtype=self.dtype, name=name)

    def make_attn(self, name):
        return AttnBlock(dtype=self.dtype, name=name)

    def make_conv_out(self, name):
        return conv_nd(self.out_ch, (3, 3), dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, z):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_res - 1)
        h = conv_nd(block_in, (3, 3), dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype or z.dtype))
        h = self.make_resblock(block_in, "mid_block_1")(h)
        h = self.make_attn("mid_attn_1")(h)
        h = self.make_resblock(block_in, "mid_block_2")(h)
        for i in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = self.make_resblock(block_out, f"up_{i}_block_{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = self.make_attn(f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = UpsampleVAE(dtype=self.dtype, name=f"up_{i}_upsample")(h)
                curr_res *= 2
        h = VAEGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        return self.make_conv_out("conv_out")(h)


@register("vae_decoder")
class Decoder(DecoderBase):
    pass


@register("video_decoder")
class VideoDecoder(DecoderBase):
    """temporal_ae.py:293-349, time_mode='conv-only' (V3D): all decoder
    ResnetBlocks gain temporal stacks, conv_out becomes AE3DConv; attention
    stays spatial-only."""

    num_frames: int = 1
    video_kernel_size: Sequence[int] = (3, 1, 1)
    alpha: float = 0.0

    def make_resblock(self, out_ch, name):
        return VideoResBlockAE(out_ch, num_frames=self.num_frames,
                               video_kernel_size=tuple(self.video_kernel_size),
                               alpha=self.alpha, dtype=self.dtype, name=name)

    def make_conv_out(self, name):
        return AE3DConv(self.out_ch, num_frames=self.num_frames,
                        video_kernel_size=tuple(self.video_kernel_size),
                        dtype=self.dtype, name=name)


def gaussian_moments_split(moments: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split encoder output into (mean, logvar), logvar clamped to +-30/20
    (distributions/distributions.py:31-34)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def gaussian_sample(rng: jax.Array, moments: jnp.ndarray) -> jnp.ndarray:
    mean, logvar = gaussian_moments_split(moments)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def gaussian_mode(moments: jnp.ndarray) -> jnp.ndarray:
    return gaussian_moments_split(moments)[0]


def gaussian_kl(moments: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0,1)) summed over non-batch dims (distributions.py:49-60)."""
    mean, logvar = gaussian_moments_split(moments)
    var = jnp.exp(logvar)
    kl = 0.5 * (mean**2 + var - 1.0 - logvar)
    return jnp.sum(kl, axis=tuple(range(1, kl.ndim)))
