"""Network wrapper (counterpart of sgm/modules/diffusionmodules/wrappers.py).

``OpenAIWrapper.forward`` (wrappers.py:23-34) repackages the conditioning
dict for the UNet: channel-concat the 'concat' cond onto x, 'crossattn' as
context, 'vector' as y.  Channels-last here.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp


def make_unet_network_fn(unet_apply: Callable, params,
                         num_video_frames: int) -> Callable:
    """Returns network(x, c_noise, cond, **extra) for the Denoiser."""

    def network(x, c_noise, cond: Dict, image_only_indicator=None, **extra):
        if "concat" in cond:
            x = jnp.concatenate(
                [x, cond["concat"].astype(x.dtype)], axis=-1)
        return unet_apply(
            params, x, c_noise,
            context=cond.get("crossattn"),
            y=cond.get("vector"),
            num_video_frames=num_video_frames,
            image_only_indicator=image_only_indicator,
        )

    return network
