"""DPT (dense prediction transformer) — the Omnidata normal/depth predictor.

TPU-native port of mesh_recon/utils/dpt.py (DPTDepthModel, backbone
"vitb_rn50_384" = timm ``vit_base_resnet50_384``: a ResNetV2-(3,4,9) stem
feeding a ViT-B/16, hooks [stage0, stage1, block8, block11], readout
"project").  V3D uses it to predict per-frame monocular normals that
supervise NeuS (mesh_recon/datasets/v3d.py:173, systems/neus_videonvs.py).

Design notes:
- Layout is NHWC; weights are converted from the torch OIHW checkpoint by
  ``core.convert.convert_dpt``.
- All resamplings (fusion ×2 upsample align_corners=True, pos-embed resize,
  final bicubic back to the source resolution) are expressed as dense
  1-D resize MATRICES applied with einsum — matmuls on the MXU instead of
  gathers, which on TPU cost ~100ns/row (see CLAUDE.md).  At DPT sizes the
  matrices are ≤384×192 constants folded by XLA.
- The ResNetV2 backbone uses weight-standardized convs with TF-'SAME'
  asymmetric padding (timm StdConv2dSame, eps 1e-8); XLA's 'SAME' padding
  has identical semantics.  The decoder convs are torch nn.Conv2d with
  symmetric padding — explicit padding here (matters at stride 2).
- Everything is static-shape at a fixed inference size (384² in the
  reference wrapper, mesh_recon/utils/dpt.py:1048) so one jit serves all
  frames.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# ---------------------------------------------------------------------------
# Resize-as-matmul helpers
# ---------------------------------------------------------------------------


def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out,in) row-stochastic bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            pos = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            pos = (i + 0.5) * in_size / out_size - 0.5
        pos = min(max(pos, 0.0), in_size - 1.0)
        lo = int(math.floor(pos))
        hi = min(lo + 1, in_size - 1)
        w = pos - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch 'cubic convolution' kernel (A=-0.75), support [-2,2]."""
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
        np.where(t < 2.0, a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a, 0.0),
    )
    return w.astype(np.float32)


def _bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out,in) bicubic matrix, half-pixel sampling + border clamp
    (torch F.interpolate mode='bicubic', align_corners=False)."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        pos = (i + 0.5) * in_size / out_size - 0.5
        base = math.floor(pos)
        for tap in range(base - 1, base + 3):
            w = float(_cubic_weight(np.array(pos - tap)))
            m[i, min(max(tap, 0), in_size - 1)] += w
    return m


def _bilinear_aa_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Antialiased bilinear downsampling matrix — PIL/torch
    ``antialias=True`` semantics: triangle kernel stretched by the scale
    factor, taps truncated to the image then renormalized."""
    scale = in_size / out_size
    support = max(scale, 1.0)
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        taps = np.arange(lo, hi)
        w = np.clip(1.0 - np.abs((taps + 0.5 - center) / support), 0.0, None)
        w = w / w.sum()
        m[i, lo:hi] = w
    return m


def _apply_resize(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """x (B,H,W,C) -> (B,H',W',C) via two 1-D resize matrices."""
    x = jnp.einsum("oh,bhwc->bowc", jnp.asarray(mh), x)
    return jnp.einsum("pw,bowc->bopc", jnp.asarray(mw), x)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    return _apply_resize(x, _bilinear_matrix(h, out_hw[0], align_corners),
                         _bilinear_matrix(w, out_hw[1], align_corners))


def resize_bicubic(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    return _apply_resize(x, _bicubic_matrix(h, out_hw[0]),
                         _bicubic_matrix(w, out_hw[1]))


def resize_bilinear_antialias(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    mh = _bilinear_aa_matrix(h, out_hw[0]) if out_hw[0] < h else \
        _bilinear_matrix(h, out_hw[0], False)
    mw = _bilinear_aa_matrix(w, out_hw[1]) if out_hw[1] < w else \
        _bilinear_matrix(w, out_hw[1], False)
    return _apply_resize(x, mh, mw)


# ---------------------------------------------------------------------------
# ResNetV2 hybrid stem (timm vit_base_resnet50_384 patch_embed.backbone)
# ---------------------------------------------------------------------------


class StdConvSame(nn.Module):
    """Weight-standardized conv, TF-'SAME' padding, no bias
    (timm StdConv2dSame, eps 1e-8)."""

    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features), jnp.float32)
        mean = k.mean(axis=(0, 1, 2), keepdims=True)
        var = k.var(axis=(0, 1, 2), keepdims=True)
        k = (k - mean) * jax.lax.rsqrt(var + 1e-8)
        return jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GroupNormAct(nn.Module):
    """GroupNorm(32) (+ optional ReLU), f32 math (timm GroupNormAct)."""

    act: bool = True

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=jnp.float32)(x.astype(jnp.float32))
        if self.act:
            out = jax.nn.relu(out)
        return out.astype(dtype)


class BottleneckV2(nn.Module):
    """timm ResNetV2 non-preact Bottleneck: conv1x1-GN-relu, conv3x3(stride)-
    GN-relu, conv1x1-GN, +shortcut (1x1 proj when shape changes), relu."""

    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        shortcut = x
        if x.shape[-1] != self.out_ch or self.stride != 1:
            shortcut = StdConvSame(self.out_ch, 1, self.stride,
                                   name="down_conv")(x)
            shortcut = GroupNormAct(act=False, name="down_norm")(shortcut)
        y = StdConvSame(mid, 1, name="conv1")(x)
        y = GroupNormAct(name="norm1")(y)
        y = StdConvSame(mid, 3, self.stride, name="conv2")(y)
        y = GroupNormAct(name="norm2")(y)
        y = StdConvSame(self.out_ch, 1, name="conv3")(y)
        y = GroupNormAct(act=False, name="norm3")(y)
        return jax.nn.relu(y + shortcut)


class ResNetV2Stem(nn.Module):
    """Stem + 3 stages of ResNetV2-(3,4,9); returns (stage0, stage1, final)
    feature maps at strides 4, 8, 16."""

    layers: Sequence[int] = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        y = StdConvSame(64, 7, 2, name="stem_conv")(x)
        y = GroupNormAct(name="stem_norm")(y)
        # MaxPool2dSame(3, stride 2): XLA 'SAME' reduce_window == TF same
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")
        feats = []
        for si, n_blocks in enumerate(self.layers):
            out_ch = 256 * (2 ** si)
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                y = BottleneckV2(out_ch, stride,
                                 name=f"stage{si}_block{bi}")(y)
            feats.append(y)
        return feats[0], feats[1], feats[2]


# ---------------------------------------------------------------------------
# ViT-B encoder (timm VisionTransformer, patch embed = hybrid 1x1 proj)
# ---------------------------------------------------------------------------


class ViTBlock(nn.Module):
    """Pre-norm transformer block (LN eps 1e-6, 12 heads, GELU-exact MLP)."""

    dim: int = 768
    heads: int = 12

    @nn.compact
    def __call__(self, x):
        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                param_dtype=jnp.float32, name=name)

        b, n, c = x.shape
        h = self.heads
        d = self.dim // h
        y = ln("norm1")(x)
        qkv = nn.Dense(3 * self.dim, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4), 3)
        attn = jax.nn.softmax(
            jnp.einsum("xbhnd,xbhmd->xbhnm", q, k) / math.sqrt(d), axis=-1)
        y = jnp.einsum("xbhnm,xbhmd->xbhnd", attn, v)[0]
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(self.dim, name="attn_proj")(y)
        y = ln("norm2")(x)
        y = nn.Dense(4 * self.dim, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        x = x + nn.Dense(self.dim, name="fc2")(y)
        return x


class DPTHybridBackbone(nn.Module):
    """vit_base_resnet50_384 with DPT hooks: returns the 4 reassembled
    feature maps (dpt.py:84-125 forward_vit + _make_vit_b_rn50_backbone)."""

    dim: int = 768
    depth: int = 12
    hooks: Tuple[int, int] = (8, 11)
    pos_grid: int = 24  # checkpoint pos_embed grid (384/16)

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        gh, gw = h // 16, w // 16
        f1, f2, f3 = ResNetV2Stem(name="backbone")(x)
        tokens = nn.Conv(self.dim, (1, 1), name="patch_proj")(f3)
        tokens = tokens.reshape(b, gh * gw, self.dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, self.dim), jnp.float32)
        # _resize_pos_embed (dpt.py:127-142): bilinear, align_corners=False
        pos_tok, pos_grid = pos_embed[:, :1], pos_embed[:, 1:]
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            pos_grid = pos_grid.reshape(1, self.pos_grid, self.pos_grid, self.dim)
            pos_grid = resize_bilinear(pos_grid, (gh, gw), align_corners=False)
            pos_grid = pos_grid.reshape(1, gh * gw, self.dim)
        pos = jnp.concatenate([pos_tok, pos_grid], axis=1)

        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.dim)), tokens], axis=1)
        tokens = tokens + pos

        hooked = {}
        for i in range(self.depth):
            tokens = ViTBlock(self.dim, name=f"vit_block{i}")(tokens)
            if i in self.hooks:
                hooked[i] = tokens
        # final model.norm exists in the ckpt but the hooks fire before it

        def reassemble(t, name):
            # readout "project": cat(tokens, cls) -> Linear(2d, d) -> GELU
            cls, feat = t[:, :1], t[:, 1:]
            y = jnp.concatenate(
                [feat, jnp.broadcast_to(cls, feat.shape)], axis=-1)
            y = nn.Dense(self.dim, name=f"{name}_proj")(y)
            y = jax.nn.gelu(y, approximate=False)
            return y.reshape(b, gh, gw, self.dim)

        l3 = reassemble(hooked[self.hooks[0]], "readout3")
        l4 = reassemble(hooked[self.hooks[1]], "readout4")
        l3 = nn.Conv(768, (1, 1), name="post3_conv")(l3)
        l4 = nn.Conv(768, (1, 1), name="post4_conv")(l4)
        # torch Conv2d(3x3, stride 2, padding=1): explicit symmetric pad
        l4 = nn.Conv(768, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     name="post4_down")(l4)
        return f1, f2, l3, l4


# ---------------------------------------------------------------------------
# DPT decoder (scratch + refinenets + head)
# ---------------------------------------------------------------------------


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv + skip (dpt.py:772-838, bn=False)."""

    features: int = 256

    @nn.compact
    def __call__(self, x):
        y = jax.nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(y)
        return y + x


class FeatureFusionBlock(nn.Module):
    """dpt.py:840-903: optional skip-add (rcu1), rcu2, ×2 bilinear
    (align_corners=True), 1x1 out conv."""

    features: int = 256

    @nn.compact
    def __call__(self, x, skip: Optional[jnp.ndarray] = None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                            align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPT(nn.Module):
    """DPTDepthModel (dpt.py:917-998): hybrid backbone -> scratch 3x3 convs
    -> 4 fusion blocks -> head.  ``num_channels=3`` + clamp for normals."""

    num_channels: int = 3
    features: int = 256
    non_negative: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B,H,W,3) in [0,1] (normal mode has no input normalization,
        dpt.py:1036-1040); H,W divisible by 32.  Returns (B,H,W,C): the
        fusion path ends at stride 2 and the head upsamples ×2."""
        l1, l2, l3, l4 = DPTHybridBackbone(name="pretrained")(x)

        def rn(feat, name):
            return nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, name=name)(feat)

        l1, l2, l3, l4 = (rn(l1, "layer1_rn"), rn(l2, "layer2_rn"),
                          rn(l3, "layer3_rn"), rn(l4, "layer4_rn"))
        p4 = FeatureFusionBlock(self.features, name="refinenet4")(l4)
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(p4, l3)
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(p3, l2)
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, l1)

        y = nn.Conv(self.features // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="head_conv1")(p1)
        y = resize_bilinear(y, (2 * y.shape[1], 2 * y.shape[2]),
                            align_corners=True)
        y = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), name="head_conv2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.num_channels, (1, 1), name="head_conv3")(y)
        if self.non_negative:
            y = jax.nn.relu(y)
        return y


def dpt_normal_inference(apply_fn, params, images: jnp.ndarray,
                         infer_size: int = 384) -> jnp.ndarray:
    """The DPT wrapper semantics (dpt.py:1036-1069, mode='normal'):
    resize to 384², run, clamp [0,1], bicubic back to the input size.
    images: (B,H,W,3) in [0,1] -> normals (B,H,W,3) in [0,1]."""
    h, w = images.shape[1], images.shape[2]
    x = resize_bilinear_antialias(images, (infer_size, infer_size))
    n = apply_fn(params, x)
    n = jnp.clip(n, 0.0, 1.0)
    return resize_bicubic(n, (h, w))
