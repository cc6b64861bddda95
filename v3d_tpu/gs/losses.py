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


def _band_matrix(n: int, size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix of the separable 1-D gaussian taps with the
    zero-padded SAME boundary the torch conv uses."""
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    half = size // 2
    m = np.zeros((n, n), np.float32)
    for off in range(-half, half + 1):
        d = np.diag(np.ones(n - abs(off), np.float32) * g[off + half],
                    k=off)
        m += d
    return m


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM.  Inputs (H, W, C) or (N, H, W, C) in [0, 1].
    Matches loss_utils.py:49-90 numerically, but the 11x11 gaussian window
    runs as two banded MATMULS (separable filter, rows/cols in the MXU
    contraction) instead of a 3-channel depthwise conv — depthwise C=3
    uses 3 of the TPU's 128 conv lanes and was a measured hotspot of the
    3DGS train step.  All five filterings ride one batched pair of dots."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    h, w = img1.shape[1], img1.shape[2]
    wh = jnp.asarray(_band_matrix(h, size, sigma))
    ww = jnp.asarray(_band_matrix(w, size, sigma))

    stack = jnp.stack([img1, img2, img1 * img1, img2 * img2, img1 * img2])
    # (5, N, H, W, C): filter H then W with one dot each.
    # HIGHEST precision is load-bearing: TPU (and this XLA CPU build) run f32
    # matmuls at bf16 precision by default (~4e-3 abs error at O(1) values),
    # and the variance terms below are catastrophic cancellations
    # (m11 - mu1^2 ~ 1e-4 in flat regions) — at default precision the SSIM
    # map is noise, can exceed 1, and training losses go NEGATIVE.
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("ih,snhwc->sniwc", wh, stack, precision=hp)
    f = jnp.einsum("jw,sniwc->snijc", ww, y, precision=hp)
    mu1, mu2, m11, m22, m12 = f[0], f[1], f[2], f[3], f[4]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = m11 - mu1_sq
    s2 = m22 - mu2_sq
    s12 = m12 - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(ssim_map)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """recon/utils/image_utils.py psnr (per-image MSE over flattened)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
