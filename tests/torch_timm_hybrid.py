"""Test fixture: a faithful torch re-implementation of timm's
``vit_base_resnet50_384`` hybrid backbone (ResNetV2-(3,4,9) stem + ViT-B/16),
with timm-compatible module/state-dict names.

timm is not installed in this environment, but the reference DPT
(mesh_recon/utils/dpt.py) builds its backbone via
``timm.create_model("vit_base_resnet50_384")``.  This module provides a
drop-in ``create_model`` so the *unmodified* reference DPT code can run in
parity tests, and so the converter can be exercised against the exact
checkpoint key layout (pretrained.model.patch_embed.backbone.stem.conv...,
pretrained.model.blocks.N.attn.qkv..., etc.).
"""

import math
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


def _same_pad(x, k, s, d=1, value=0.0):
    """TF-'SAME' asymmetric padding (timm pad_same)."""
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + (k - 1) * d + 1 - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + (k - 1) * d + 1 - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2), value=value)


class StdConv2dSame(nn.Conv2d):
    """Weight-standardized conv with SAME padding (timm, eps=1e-8)."""

    def __init__(self, in_ch, out_ch, k, stride=1):
        super().__init__(in_ch, out_ch, k, stride=stride, padding=0, bias=False)

    def forward(self, x):
        w = self.weight
        var, mean = torch.var_mean(w, dim=(1, 2, 3), keepdim=True,
                                   unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, None, self.stride, 0)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, ch, apply_act=True):
        super().__init__(32, ch, eps=1e-5)
        self.apply_act = apply_act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.apply_act else x


class DownsampleConv(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv = StdConv2dSame(in_ch, out_ch, 1, stride=stride)
        self.norm = GroupNormAct(out_ch, apply_act=False)

    def forward(self, x):
        return self.norm(self.conv(x))


class Bottleneck(nn.Module):
    """timm ResNetV2 non-preact bottleneck."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        mid = out_ch // 4
        self.downsample = (DownsampleConv(in_ch, out_ch, stride)
                           if (in_ch != out_ch or stride != 1) else None)
        self.conv1 = StdConv2dSame(in_ch, mid, 1)
        self.norm1 = GroupNormAct(mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride=stride)
        self.norm2 = GroupNormAct(mid)
        self.conv3 = StdConv2dSame(mid, out_ch, 1)
        self.norm3 = GroupNormAct(out_ch, apply_act=False)

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = self.norm1(self.conv1(x))
        y = self.norm2(self.conv2(y))
        y = self.norm3(self.conv3(y))
        return F.relu(y + shortcut)


class ResNetStage(nn.Module):
    def __init__(self, in_ch, out_ch, depth, stride):
        super().__init__()
        blocks = []
        for i in range(depth):
            blocks.append(Bottleneck(in_ch if i == 0 else out_ch, out_ch,
                                     stride if i == 0 else 1))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class MaxPool2dSame(nn.Module):
    def forward(self, x):
        x = _same_pad(x, 3, 2, value=float("-inf"))
        return F.max_pool2d(x, 3, 2, 0)


class ResNetV2(nn.Module):
    def __init__(self, layers=(3, 4, 9)):
        super().__init__()
        self.stem = nn.Sequential(OrderedDict(
            conv=StdConv2dSame(3, 64, 7, stride=2),
            norm=GroupNormAct(64),
            pool=MaxPool2dSame(),
        ))
        stages = []
        in_ch = 64
        for i, d in enumerate(layers):
            out_ch = 256 * (2 ** i)
            stages.append(ResNetStage(in_ch, out_ch, d, 1 if i == 0 else 2))
            in_ch = out_ch
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        return self.stages(self.stem(x))


class Attention(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(y)


class Mlp(nn.Module):
    def __init__(self, dim=768, hidden=3072):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class HybridEmbed(nn.Module):
    def __init__(self, backbone_ch=1024, dim=768):
        super().__init__()
        self.backbone = ResNetV2()
        self.proj = nn.Conv2d(backbone_ch, dim, 1)

    def forward(self, x):  # unused by DPT's forward_flex (it calls parts)
        return self.proj(self.backbone(x)).flatten(2).transpose(1, 2)


class VisionTransformerHybrid(nn.Module):
    """Matches timm vit_base_resnet50_384's attribute/state-dict layout."""

    def __init__(self, dim=768, depth=12, heads=12, grid=24):
        super().__init__()
        self.patch_embed = HybridEmbed(dim=dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.Sequential(*[Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        nn.init.trunc_normal_(self.pos_embed, std=0.02)
        nn.init.trunc_normal_(self.cls_token, std=0.02)

    def forward(self, x):
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = self.pos_drop(x + self.pos_embed)
        x = self.blocks(x)
        return self.norm(x)


def create_model(name, pretrained=False, **kwargs):
    assert "resnet50" in name or "r50" in name, name
    return VisionTransformerHybrid()


def install_timm_stub():
    """Make `import timm` resolve to this fixture (and stub torchvision,
    absent in this environment) so /root/reference/mesh_recon/utils/dpt.py
    imports unmodified."""
    import importlib.machinery
    import sys
    import types

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    if "timm" not in sys.modules:
        timm = _mod("timm")
        timm.create_model = create_model
        sys.modules["timm"] = timm

    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        tr = _mod("torchvision.transforms")

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        class Resize:
            def __init__(self, size, **kw):
                self.size = size

            def __call__(self, x):
                return F.interpolate(x, size=self.size, mode="bilinear",
                                     align_corners=False, antialias=True)

        class Normalize:
            def __init__(self, mean, std):
                self.mean, self.std = mean, std

            def __call__(self, x):
                return (x - self.mean) / self.std

        tr.Compose, tr.Resize, tr.Normalize = Compose, Resize, Normalize
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


def load_reference_dpt_module():
    """Import /root/reference/mesh_recon/utils/dpt.py unmodified."""
    import importlib.util

    install_timm_stub()
    spec = importlib.util.spec_from_file_location(
        "ref_mesh_recon_dpt", "/root/reference/mesh_recon/utils/dpt.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
