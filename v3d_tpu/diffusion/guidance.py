"""Classifier-free guidance strategies.

Counterpart of sgm/modules/diffusionmodules/guiders.py:24-146.  A guider
(a) assembles the CFG-doubled network inputs — uncond batch concatenated with
cond batch — and (b) recombines the two denoised halves.  V3D's
``LinearPredictionGuider`` applies a per-frame linearly increasing scale over
the ``num_frames`` orbit views; ``TrianglePredictionGuider`` (the reference's
``CentralPredictionGuider``) peaks at 2*max_scale mid-orbit.

Video batches are laid out ``(b*t, ...)`` with frames fastest-varying, same as
the reference's rearrange '(b t) ... -> b t ...'.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from v3d_tpu.core.registry import register
from v3d_tpu.utils.misc import append_dims

Cond = Dict[str, jnp.ndarray]

# Conditioning entries that are batched (and therefore doubled for CFG);
# everything else is assumed identical between cond and uncond.
BATCHED_COND_KEYS = ("vector", "crossattn", "concat")


def _prepare_cfg_inputs(x, s, c: Cond, uc: Cond, extra_keys=()) -> Tuple:
    batched = set(BATCHED_COND_KEYS) | set(extra_keys)
    c_out = {}
    for k in c:
        if k in batched:
            c_out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
        elif k == "rgb":  # pixelnerf rgb target: cond-only, skip (guiders.py:97)
            continue
        else:
            c_out[k] = c[k]
    return jnp.concatenate([x, x], axis=0), jnp.concatenate([s, s], axis=0), c_out


@register("identity_guider")
@dataclasses.dataclass(frozen=True)
class IdentityGuider:
    def prepare_inputs(self, x, s, c: Cond, uc: Cond):
        return x, s, dict(c)

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        return x


@register("vanilla_cfg")
@dataclasses.dataclass(frozen=True)
class VanillaCFG:
    scale: float = 1.0

    def prepare_inputs(self, x, s, c: Cond, uc: Cond):
        return _prepare_cfg_inputs(x, s, c, uc)

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        x_u, x_c = jnp.split(x, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)


@dataclasses.dataclass(frozen=True)
class _FrameScaleGuider:
    """Shared machinery: per-frame guidance scale over the t axis of (b t)."""

    max_scale: float
    num_frames: int
    min_scale: float = 1.0
    additional_cond_keys: tuple = ()

    def frame_scales(self) -> np.ndarray:
        raise NotImplementedError

    def prepare_inputs(self, x, s, c: Cond, uc: Cond):
        return _prepare_cfg_inputs(x, s, c, uc, self.additional_cond_keys)

    def __call__(self, x: jnp.ndarray, sigma) -> jnp.ndarray:
        x_u, x_c = jnp.split(x, 2, axis=0)
        t = self.num_frames
        b = x_u.shape[0] // t
        x_u = x_u.reshape((b, t) + x_u.shape[1:])
        x_c = x_c.reshape((b, t) + x_c.shape[1:])
        scale = jnp.asarray(self.frame_scales(), dtype=x_u.dtype)[None, :]
        out = x_u + append_dims(scale, x_u.ndim) * (x_c - x_u)
        return out.reshape((b * t,) + out.shape[2:])


@register("linear_prediction_guider")
@dataclasses.dataclass(frozen=True)
class LinearPredictionGuider(_FrameScaleGuider):
    """guiders.py:60-103 — scale ramps linspace(min, max) over frames."""

    def frame_scales(self) -> np.ndarray:
        return np.linspace(self.min_scale, self.max_scale, self.num_frames, dtype=np.float32)


@register("triangle_prediction_guider")
@dataclasses.dataclass(frozen=True)
class TrianglePredictionGuider(_FrameScaleGuider):
    """guiders.py:104-146 (``CentralPredictionGuider``) — scale ramps up to
    2*max_scale at the middle frame then back down (mirrored second half)."""

    def frame_scales(self) -> np.ndarray:
        t = self.num_frames
        scale = np.linspace(self.min_scale, 2 * self.max_scale, t, dtype=np.float32)
        scale[t // 2:] = 2 * self.max_scale - scale[t // 2:]
        return scale
