"""U2Net salient-object segmentation in flax — the rembg background-removal
model, TPU-native.

The reference removes backgrounds with rembg (ONNX u2net) at every entry
point: scripts/pub/V3D_512.py:17,210, app.py:22,
mesh_recon/datasets/v3d.py:14,159-161.  This ports the architecture
(xuebinqin/U-2-Net) to flax/NHWC; weights convert from the torch checkpoint
via ``core.convert.convert_u2net`` and gate cleanly when absent (the
luminance-matte fallback in data/preprocess.py stays the no-weights path).

Inference protocol (rembg semantics): resize to 320x320, scale by the image
max, normalize with ImageNet mean/std, forward, take the fused output d0,
min-max normalize, resize back — ``u2net_matte``.

BatchNorm runs in eval mode only (this model is never trained here), so the
running statistics are stored as plain params and applied as an affine
transform.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from v3d_tpu.models.dpt import resize_bilinear


def _maxpool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(2, stride=2, ceil_mode=True): pad odd dims with -inf."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample_like(src: jnp.ndarray, tar: jnp.ndarray) -> jnp.ndarray:
    return resize_bilinear(src, (tar.shape[1], tar.shape[2]),
                           align_corners=False)


class REBNCONV(nn.Module):
    out_ch: int
    dirate: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dirate
        x = nn.Conv(self.out_ch, (3, 3), kernel_dilation=(d, d),
                    padding=((d, d), (d, d)), name="conv")(x)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return nn.relu(x)


class RSU(nn.Module):
    """RSU-L (L = height): a small UNet returning hx1d + hxin."""

    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, 1, name="rebnconvin")(x)
        enc = []
        hx = hxin
        for i in range(1, self.height):
            hx = REBNCONV(self.mid_ch, 1, name=f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < self.height - 1:
                hx = _maxpool_ceil(hx)
        hx = REBNCONV(self.mid_ch, 2, name=f"rebnconv{self.height}")(enc[-1])
        for i in range(self.height - 1, 0, -1):
            ch = self.out_ch if i == 1 else self.mid_ch
            hx = REBNCONV(ch, 1, name=f"rebnconv{i}d")(
                jnp.concatenate([hx, enc[i - 1]], axis=-1))
            if i > 1:
                hx = _upsample_like(hx, enc[i - 2])
        return hx + hxin


class RSU4F(nn.Module):
    """Dilated (pool-free) RSU."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, 1, name="rebnconvin")(x)
        hx1 = REBNCONV(self.mid_ch, 1, name="rebnconv1")(hxin)
        hx2 = REBNCONV(self.mid_ch, 2, name="rebnconv2")(hx1)
        hx3 = REBNCONV(self.mid_ch, 4, name="rebnconv3")(hx2)
        hx4 = REBNCONV(self.mid_ch, 8, name="rebnconv4")(hx3)
        hx3d = REBNCONV(self.mid_ch, 4, name="rebnconv3d")(
            jnp.concatenate([hx4, hx3], -1))
        hx2d = REBNCONV(self.mid_ch, 2, name="rebnconv2d")(
            jnp.concatenate([hx3d, hx2], -1))
        hx1d = REBNCONV(self.out_ch, 1, name="rebnconv1d")(
            jnp.concatenate([hx2d, hx1], -1))
        return hx1d + hxin


class U2Net(nn.Module):
    """Full U2Net (``small=False``) or u2netp (``small=True``), out_ch=1.

    Returns (d0, d1..d6) sigmoid maps at input resolution; d0 (the fused
    side-output) is the saliency mask rembg thresholds.
    """

    out_ch: int = 1
    small: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        if self.small:
            enc = [RSU(7, 16, 64, name="stage1"), RSU(6, 16, 64, name="stage2"),
                   RSU(5, 16, 64, name="stage3"), RSU(4, 16, 64, name="stage4"),
                   RSU4F(16, 64, name="stage5"), RSU4F(16, 64, name="stage6")]
            dec = [RSU4F(16, 64, name="stage5d"), RSU(4, 16, 64, name="stage4d"),
                   RSU(5, 16, 64, name="stage3d"), RSU(6, 16, 64, name="stage2d"),
                   RSU(7, 16, 64, name="stage1d")]
        else:
            enc = [RSU(7, 32, 64, name="stage1"), RSU(6, 32, 128, name="stage2"),
                   RSU(5, 64, 256, name="stage3"), RSU(4, 128, 512, name="stage4"),
                   RSU4F(256, 512, name="stage5"), RSU4F(256, 512, name="stage6")]
            dec = [RSU4F(256, 512, name="stage5d"), RSU(4, 128, 256, name="stage4d"),
                   RSU(5, 64, 128, name="stage3d"), RSU(6, 32, 64, name="stage2d"),
                   RSU(7, 16, 64, name="stage1d")]

        hx1 = enc[0](x)
        hx2 = enc[1](_maxpool_ceil(hx1))
        hx3 = enc[2](_maxpool_ceil(hx2))
        hx4 = enc[3](_maxpool_ceil(hx3))
        hx5 = enc[4](_maxpool_ceil(hx4))
        hx6 = enc[5](_maxpool_ceil(hx5))

        hx5d = dec[0](jnp.concatenate([_upsample_like(hx6, hx5), hx5], -1))
        hx4d = dec[1](jnp.concatenate([_upsample_like(hx5d, hx4), hx4], -1))
        hx3d = dec[2](jnp.concatenate([_upsample_like(hx4d, hx3), hx3], -1))
        hx2d = dec[3](jnp.concatenate([_upsample_like(hx3d, hx2), hx2], -1))
        hx1d = dec[4](jnp.concatenate([_upsample_like(hx2d, hx1), hx1], -1))

        def side(i, h):
            return nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                           name=f"side{i}")(h)

        d1 = side(1, hx1d)
        d2 = _upsample_like(side(2, hx2d), d1)
        d3 = _upsample_like(side(3, hx3d), d1)
        d4 = _upsample_like(side(4, hx4d), d1)
        d5 = _upsample_like(side(5, hx5d), d1)
        d6 = _upsample_like(side(6, hx6), d1)
        d0 = nn.Conv(self.out_ch, (1, 1), name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], -1))
        return tuple(jax.nn.sigmoid(d) for d in (d0, d1, d2, d3, d4, d5, d6))


# ---------------------------------------------------------------------------
# rembg-equivalent matting
# ---------------------------------------------------------------------------

_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def u2net_matte(apply_fn, params, image: np.ndarray,
                infer_size: int = 320) -> np.ndarray:
    """rembg's mask protocol: 320^2 inference, fused output d0, min-max
    normalize, resize to input size.  ``image`` (H, W, 3) uint8; returns
    RGBA uint8."""
    img = np.asarray(image)[..., :3]
    h, w = img.shape[:2]
    x = img.astype(np.float32)
    x = x / max(float(x.max()), 1e-6)
    x = (x - _MEAN) / _STD
    xr = np.asarray(resize_bilinear(jnp.asarray(x)[None],
                                    (infer_size, infer_size),
                                    align_corners=False))
    d0 = apply_fn(params, jnp.asarray(xr))[0]
    pred = np.asarray(d0)[0, :, :, 0]
    mn, mx = float(pred.min()), float(pred.max())
    pred = (pred - mn) / max(mx - mn, 1e-8)
    mask = np.asarray(resize_bilinear(
        jnp.asarray(pred, jnp.float32)[None, :, :, None], (h, w),
        align_corners=False))[0, :, :, 0]
    alpha = np.clip(mask * 255.0, 0, 255).astype(np.uint8)
    return np.concatenate([img.astype(np.uint8), alpha[..., None]], axis=-1)


def load_u2net(path: Optional[str] = None, small: Optional[bool] = None):
    """Weights-gated loader: returns a rembg-signature callable
    ``image -> RGBA`` or None when no checkpoint is available.

    Accepts a torch ``u2net.pth``/``u2netp.pth`` (converted on the fly) or a
    pre-converted orbax tree directory.  Search order: ``path`` argument,
    $V3D_U2NET_CKPT, ckpts/u2net{,p}{.pth,.orbax}.
    """
    import os

    candidates = [path, os.environ.get("V3D_U2NET_CKPT")]
    for stem in ("u2net", "u2netp"):
        for ext in (".orbax", ".pth"):
            candidates.append(os.path.join("ckpts", stem + ext))
    found = next((c for c in candidates if c and os.path.exists(c)), None)
    if found is None:
        return None

    from v3d_tpu.core.checkpoint import load_pytree
    from v3d_tpu.core.convert import convert_u2net

    if os.path.isdir(found):
        params = load_pytree(found)
    else:
        import torch

        sd = torch.load(found, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = convert_u2net(sd)
    if small is None:
        # u2netp's stage2 input conv has 64 in-channels (full: 128 out)
        k = params["params"]["stage2"]["rebnconvin"]["conv"]["kernel"]
        small = int(np.asarray(k).shape[-1]) == 64
    model = U2Net(small=small)
    apply_fn = jax.jit(model.apply)

    def remove_bg(image: np.ndarray) -> np.ndarray:
        return u2net_matte(apply_fn, params, image)

    remove_bg.kind = "u2net"  # type: ignore[attr-defined]
    return remove_bg
