"""ResUNet image encoder for PixelNeRF conditioning — flax port of
sgm/modules/encoders/image_encoder.py:200-349 (the full-capacity encoder;
the small v2 UNet lives in models/pixelnerf.py).

Architecture quirks preserved exactly:
- all convs use REFLECT padding (image_encoder.py:38,50,175)
- BatchNorm with track_running_stats=False: batch statistics are used even
  at eval time — implemented as a stateless per-batch normalization
- encoder = resnet34 stem + layer1..3 (strides 2,2,2, BasicBlocks [3,4,6]),
  ReLU; decoder convs use ELU (image_encoder.py:165-184)
- 2x bilinear upsampling with align_corners=True (upconv :187-197, via the
  resize-matrix helper of models/dpt.py — matmuls, not gathers)
- skip connections pad the encoder feature then concat [up, skip] (:313-343)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.dpt import resize_bilinear


def _reflect_conv(x, kernel, stride: int = 1, bias=None):
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class ReflectConv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, x.shape[-1], self.features),
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return _reflect_conv(x, k, self.stride, b)


class BatchStatNorm(nn.Module):
    """torch BatchNorm2d(track_running_stats=False): normalize with the
    CURRENT batch's (N,H,W) statistics, affine."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=(0, 1, 2))
        var = x32.var(axis=(0, 1, 2))
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y.astype(x.dtype)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ReflectConv(self.planes, 3, self.stride, use_bias=False,
                        name="conv1")(x)
        y = BatchStatNorm(name="bn1")(y)
        y = jax.nn.relu(y)
        y = ReflectConv(self.planes, 3, use_bias=False, name="conv2")(y)
        y = BatchStatNorm(name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = ReflectConv(self.planes, 1, self.stride,
                                   use_bias=False, name="down_conv")(x)
            identity = BatchStatNorm(name="down_bn")(identity)
        return jax.nn.relu(y + identity)


class ConvBnElu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = ReflectConv(self.features, self.kernel, self.stride,
                        name="conv")(x)
        y = BatchStatNorm(name="bn")(y)
        return jax.nn.elu(y)


class ResUNet(nn.Module):
    """(N,H,W,3) -> (N,H/4,W/4, coarse+fine) feature maps."""

    coarse_out_ch: int = 32
    fine_out_ch: int = 32
    layers: Sequence[int] = (3, 4, 6)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.coarse_out_ch + self.fine_out_ch
        y = ReflectConv(64, 7, 2, use_bias=False, name="conv1")(x)
        y = BatchStatNorm(name="bn1")(y)
        y = jax.nn.relu(y)

        feats = []
        for li, (planes, n_blocks) in enumerate(
                zip((64, 128, 256), self.layers)):
            for bi in range(n_blocks):
                y = BasicBlock(planes, 2 if bi == 0 else 1,
                               name=f"layer{li + 1}_block{bi}")(y)
            feats.append(y)
        x1, x2, x3 = feats

        def up(z):
            return resize_bilinear(z, (2 * z.shape[1], 2 * z.shape[2]),
                                   align_corners=True)

        def skip(z, s):
            # forward (:335-343) calls skipconnect(enc, up): the ENCODER
            # feature s is padded to the upsampled z's size, and the concat
            # order is [upsampled, encoder] (:313-326)
            dy, dx = z.shape[1] - s.shape[1], z.shape[2] - s.shape[2]
            s = jnp.pad(s, ((0, 0), (dy // 2, dy - dy // 2),
                            (dx // 2, dx - dx // 2), (0, 0)))
            return jnp.concatenate([z, s], axis=-1)

        y = ConvBnElu(128, 3, name="upconv3")(up(x3))
        y = ConvBnElu(128, 3, name="iconv3")(skip(y, x2))
        y = ConvBnElu(64, 3, name="upconv2")(up(y))
        y = ConvBnElu(out_ch, 3, name="iconv2")(skip(y, x1))
        return ReflectConv(out_ch, 1, name="out_conv")(y)
