"""LPIPS perceptual distance (replacement for the two vendored torch LPIPS
copies: sgm/modules/autoencoding/lpips/ and recon/lpipsPyTorch/).

Architecture: VGG16 features at relu1_2/2_2/3_3/4_3/5_3, unit-normalized per
channel, squared difference, learned 1x1 linear heads, spatial mean, summed
over layers.  Weights (VGG16 + LPIPS heads) must be supplied as a converted
.npz — this environment has no pretrained torchvision/LPIPS weights and no
egress, so ``load_lpips`` returns None when absent and callers fall back to
lambda_lpips=0 (documented deviation; the loss plumbing is in place).

``convert_lpips_torch`` converts a torch LPIPS state dict (keys ``net.slice*``
/ ``lin*.model.1.weight``) into the npz layout.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (name, out_channels); 'M' = maxpool.  Feature taps after
# the ReLU of the last conv in each block.
VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
TAPS = (1, 3, 6, 9, 12)  # conv indices (0-based among convs) of relu taps
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def vgg_features(params: Dict, x: jnp.ndarray):
    """x: (N, H, W, 3) in [-1, 1] -> list of tap activations."""
    h = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    feats = []
    conv_i = 0
    for spec in VGG_PLAN:
        if spec == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        w = params[f"conv{conv_i}_w"]
        b = params[f"conv{conv_i}_b"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        if conv_i in TAPS:
            feats.append(h)
        conv_i += 1
    return feats


def lpips_distance(params: Dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: (N, H, W, 3) in [0, 1] -> (N,) perceptual distances."""
    fx = vgg_features(params, x * 2 - 1)
    fy = vgg_features(params, y * 2 - 1)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = params[f"lin{i}"]  # (C,) nonneg weights of the 1x1 head
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


def load_lpips(weights_path: Optional[str] = None):
    """Returns lpips_fn(x, y) -> scalar mean distance, or None if weights are
    unavailable."""
    path = weights_path or os.environ.get(
        "V3D_TPU_LPIPS_WEIGHTS", "/root/repo/weights/lpips_vgg.npz")
    if not os.path.exists(path):
        return None
    data = dict(np.load(path))
    params = {k: jnp.asarray(v) for k, v in data.items()}

    def lpips_fn(x, y):
        return jnp.mean(lpips_distance(params, x, y))

    return lpips_fn


def convert_lpips_torch(state_dict) -> Dict[str, np.ndarray]:
    """torch LPIPS(VGG) state dict -> our npz layout."""
    out = {}
    # torch vgg16.features indices of the 13 convs
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    # gather convs by trailing ".{idx}.weight" (matches both "net.sliceN.M.*"
    # and flat "features.M.*" layouts)
    convs = {}
    for k, v in state_dict.items():
        for i, ti in enumerate(tv_idx):
            if k.endswith(f".{ti}.weight") and v.ndim == 4:
                convs[(i, "w")] = np.asarray(v.detach().cpu().numpy()
                                             ).transpose(2, 3, 1, 0)
            elif k.endswith(f".{ti}.bias") and v.ndim == 1:
                convs[(i, "b")] = np.asarray(v.detach().cpu().numpy())
    for i in range(len(tv_idx)):
        out[f"conv{i}_w"] = convs[(i, "w")]
        out[f"conv{i}_b"] = convs[(i, "b")]
    for li in range(5):
        for k, v in state_dict.items():
            if f"lin{li}" in k and k.endswith("weight"):
                out[f"lin{li}"] = np.asarray(
                    v.detach().cpu().numpy()).reshape(-1)
    return out
