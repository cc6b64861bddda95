"""GeneralConditioner + embedders (counterpart of
sgm/modules/encoders/modules.py:86-228, 937-1073).

Design: embedders are lightweight callables (param-free math, or bound flax
apply functions for CLIP/VAE).  The conditioner routes each embedder output
by rank into {vector, crossattn, concat} and concatenates along the feature
axis, exactly mirroring OUTPUT_DIM2KEYS/KEY2CATDIM (modules.py:87-88) —
adjusted for NHWC: 4/5-D outputs are image-like and concat on the channel
(last) axis.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from v3d_tpu.core.registry import register
from v3d_tpu.models.layers import timestep_embedding
from v3d_tpu.utils.misc import append_dims

# output rank -> conditioning key (2: per-sample vector, 3: token sequence,
# 4/5: image-like, concatenated to the UNet input channels)
OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
# concat axis per key; image-like outputs concat on channels-last
KEY2CATDIM = {"vector": -1, "crossattn": -1, "concat": -1}


@register("identity_encoder")
@dataclasses.dataclass(frozen=True)
class IdentityEncoder:
    def __call__(self, x):
        return x


@register("concat_timestep_embedder_nd")
@dataclasses.dataclass(frozen=True)
class ConcatTimestepEmbedderND:
    """modules.py:937-953: sinusoidal embedding of each scalar dim,
    concatenated -> (b, d * outdim).  V3D uses outdim=256 on fps_id,
    motion_bucket_id, cond_aug -> 768-dim vector conditioning."""

    outdim: int = 256

    def __call__(self, x):
        if x.ndim == 1:
            x = x[:, None]
        b, dims = x.shape
        emb = timestep_embedding(x.reshape(-1), self.outdim)
        return emb.reshape(b, dims * self.outdim)


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    """One entry of the conditioner: ``embed`` maps batch[input_key] (plus an
    optional rng) to an embedding array."""

    embed: Callable
    input_key: str
    ucg_rate: float = 0.0
    is_trainable: bool = False
    needs_rng: bool = False


@register("general_conditioner")
@dataclasses.dataclass(frozen=True)
class GeneralConditioner:
    embedders: Sequence[EmbedderSpec] = ()

    def __call__(self, batch: Dict, force_zero_embeddings: Sequence[str] = (),
                 rng: Optional[jax.Array] = None,
                 apply_ucg: bool = False) -> Dict[str, jnp.ndarray]:
        output: Dict[str, jnp.ndarray] = {}
        for i, spec in enumerate(self.embedders):
            if spec.input_key not in batch:
                raise KeyError(f"conditioner input {spec.input_key!r} missing")
            args = [batch[spec.input_key]]
            if spec.needs_rng:
                if rng is None:
                    raise ValueError(f"embedder {spec.input_key} needs rng")
                rng, sub = jax.random.split(rng)
                args.append(sub)
            emb_out = spec.embed(*args)
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for emb in emb_out:
                key = OUTPUT_DIM2KEYS[emb.ndim]
                if apply_ucg and spec.ucg_rate > 0.0:
                    if rng is None:
                        raise ValueError("ucg dropout needs rng")
                    rng, sub = jax.random.split(rng)
                    keep = jax.random.bernoulli(
                        sub, 1.0 - spec.ucg_rate, (emb.shape[0],))
                    emb = append_dims(keep.astype(emb.dtype), emb.ndim) * emb
                if spec.input_key in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                if key in output:
                    output[key] = jnp.concatenate(
                        [output[key], emb], axis=KEY2CATDIM[key])
                else:
                    output[key] = emb
        return output

    def get_unconditional_conditioning(
        self, batch_c: Dict, batch_uc: Optional[Dict] = None,
        force_uc_zero_embeddings: Sequence[str] = (),
        force_cond_zero_embeddings: Sequence[str] = (),
        rng: Optional[jax.Array] = None):
        """modules.py:186-204 — build (c, uc) with ucg dropout disabled."""
        c = self(batch_c, force_cond_zero_embeddings, rng=rng, apply_ucg=False)
        uc = self(batch_c if batch_uc is None else batch_uc,
                  force_uc_zero_embeddings, rng=rng, apply_ucg=False)
        return c, uc


def repeat_cond_per_frame(c: Dict, num_frames: int,
                          keys: Sequence[str] = ("crossattn", "concat")) -> Dict:
    """scripts/pub/V3D_512.py:263-267: repeat selected cond entries per frame
    and flatten (b, ...) -> ((b t), ...)."""
    out = dict(c)
    for k in keys:
        if k in out:
            v = out[k]
            v = jnp.repeat(v[:, None], num_frames, axis=1)
            out[k] = v.reshape((-1,) + v.shape[2:])
    return out
