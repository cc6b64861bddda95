"""PixelNeRF conditioner (counterpart of sgm/modules/encoders/pixelnerf.py:
RayGenerator :62, RaySampler :161, PixelNeRF :296, and the small UNet
feature extractor of encoders/image_encoder_v2.py).

The camera-conditioned V3D variant feeds, per target view, a PixelNeRF
rendering (rgb + features) as extra UNet concat channels
(StandardDiffusionLossWithPixelNeRFLoss trains the rgb head,
loss.py:120-186).  All geometry is batched and static-shape: rays for every
target view, stratified samples, features bilinearly gathered from the
source-image feature map.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from v3d_tpu.models.layers import conv_nd, dense


class SmallUNetEncoder(nn.Module):
    """image_encoder_v2.py:11 — a compact UNet producing a feature map at
    input resolution."""

    features: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        e1 = nn.silu(conv_nd(f, (3, 3), dtype=self.dtype, name="enc1")(x))
        e2 = nn.silu(conv_nd(2 * f, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             name="enc2")(e1))
        e3 = nn.silu(conv_nd(4 * f, (3, 3), strides=(2, 2),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             name="enc3")(e2))
        d2 = jnp.repeat(jnp.repeat(e3, 2, 1), 2, 2)
        d2 = nn.silu(conv_nd(2 * f, (3, 3), dtype=self.dtype, name="dec2")(
            jnp.concatenate([d2, e2], -1)))
        d1 = jnp.repeat(jnp.repeat(d2, 2, 1), 2, 2)
        d1 = nn.silu(conv_nd(f, (3, 3), dtype=self.dtype, name="dec1")(
            jnp.concatenate([d1, e1], -1)))
        return d1


def generate_rays(c2w: jnp.ndarray, K: jnp.ndarray, h: int, w: int):
    """RayGenerator (pixelnerf.py:62): per-pixel world rays for one camera.
    OpenCV convention (+z forward)."""
    j, i = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    dirs = jnp.stack([(i + 0.5 - K[0, 2]) / K[0, 0],
                      (j + 0.5 - K[1, 2]) / K[1, 1],
                      jnp.ones_like(i)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def project_to_source(pts: jnp.ndarray, src_w2c: jnp.ndarray,
                      src_K: jnp.ndarray, h: int, w: int):
    """World points -> source-view pixel coords (uv in [0,1]) + validity."""
    p = pts @ src_w2c[:3, :3].T + src_w2c[:3, 3]
    z = p[..., 2]
    u = (p[..., 0] / jnp.maximum(z, 1e-6) * src_K[0, 0] + src_K[0, 2]) / w
    v = (p[..., 1] / jnp.maximum(z, 1e-6) * src_K[1, 1] + src_K[1, 2]) / h
    valid = (z > 1e-4) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    return jnp.stack([u, v], -1), valid


def bilinear_sample(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); uv (..., 2) in [0,1] -> (..., C)."""
    h, w, c = feat.shape
    x = uv[..., 0] * (w - 1)
    y = uv[..., 1] * (h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = y - y0
    f00 = feat[y0, x0]
    f01 = feat[y0, x0 + 1]
    f10 = feat[y0 + 1, x0]
    f11 = feat[y0 + 1, x0 + 1]
    return ((1 - fy)[..., None] * ((1 - fx)[..., None] * f00 + fx[..., None] * f01)
            + fy[..., None] * ((1 - fx)[..., None] * f10 + fx[..., None] * f11))


class PixelNeRF(nn.Module):
    """pixelnerf.py:296 — render (rgb, features) for target views conditioned
    on one source view."""

    num_samples: int = 32
    near: float = 0.5
    far: float = 3.5
    feat_dim: int = 64
    out_feature_dim: int = 4
    encoder_type: str = "small_unet"  # or "resunet" (image_encoder.py:200)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.encoder_type == "resunet":
            from v3d_tpu.models.pixelnerf_encoder import ResUNet

            half = self.feat_dim // 2
            self.encoder = ResUNet(coarse_out_ch=half,
                                   fine_out_ch=self.feat_dim - half,
                                   dtype=self.dtype)
        else:
            self.encoder = SmallUNetEncoder(self.feat_dim, dtype=self.dtype)
        self.mlp1 = dense(128, dtype=self.dtype, name="mlp1")
        self.mlp2 = dense(128, dtype=self.dtype, name="mlp2")
        self.density_head = dense(1, dtype=self.dtype, name="density_head")
        self.rgb_head = dense(3 + self.out_feature_dim, dtype=self.dtype,
                              name="rgb_head")

    def __call__(self, src_image, src_w2c, src_K, tgt_c2ws, tgt_Ks,
                 out_hw: Tuple[int, int], rng: Optional[jax.Array] = None):
        """src_image (H, W, 3) in [-1,1]; tgt_c2ws (V, 4, 4) OpenCV ->
        (rgb (V, h, w, 3), feats (V, h, w, F))."""
        H, W = src_image.shape[:2]
        feat_map = self.encoder(src_image[None])[0]
        h, w = out_hw
        s = jnp.linspace(0.0, 1.0, self.num_samples)
        if rng is not None:
            s = s + jax.random.uniform(rng, s.shape) / self.num_samples
        t_vals = self.near + (self.far - self.near) * s

        def render_view(c2w, K):
            scale = jnp.asarray([[w / W, 0, 0], [0, h / H, 0], [0, 0, 1.0]])
            rays_o, rays_d = generate_rays(c2w, scale @ K, h, w)
            pts = rays_o[..., None, :] + rays_d[..., None, :] * t_vals[:, None]
            uv, valid = project_to_source(pts, src_w2c, src_K, W, H)
            f = bilinear_sample(feat_map, uv)
            f = jnp.where(valid[..., None], f, 0.0)
            x = nn.silu(self.mlp1(f))
            x = nn.silu(self.mlp2(x))
            sigma = jax.nn.softplus(self.density_head(x)[..., 0])
            sigma = jnp.where(valid, sigma, 0.0)
            rgbf = self.rgb_head(x)
            delta = (self.far - self.near) / self.num_samples
            alpha = 1 - jnp.exp(-sigma * delta)
            t_excl = jnp.cumprod(1 - alpha + 1e-10, axis=-1)
            t_excl = jnp.concatenate(
                [jnp.ones_like(t_excl[..., :1]), t_excl[..., :-1]], -1)
            wgt = alpha * t_excl
            out = jnp.sum(wgt[..., None] * rgbf, axis=-2)
            return out[..., :3], out[..., 3:]

        rgb, feats = jax.vmap(render_view)(tgt_c2ws, tgt_Ks)
        return rgb, feats
