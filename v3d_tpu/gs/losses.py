"""3DGS training losses (counterpart of recon/utils/loss_utils.py).

l1 + SSIM (11x11 gaussian window, sigma 1.5, C1=0.01^2 C2=0.03^2) exactly as
the reference; LPIPS lives in v3d_tpu.metrics.lpips.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM.  Inputs (H, W, C) or (N, H, W, C) in [0, 1].
    Matches loss_utils.py:49-90 (same-padding window convs)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    c = img1.shape[-1]
    win = jnp.asarray(_gaussian_window(size, sigma)).reshape(size, size, 1, 1)
    win = jnp.tile(win, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, win, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(ssim_map)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """recon/utils/image_utils.py psnr (per-image MSE over flattened)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
