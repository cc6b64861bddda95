"""Checkpoint IO: orbax pytree store + torch checkpoint ingestion.

Covers the reference's checkpoint/resume story (SURVEY.md §5):
- ``save_pytree`` / ``load_pytree``: orbax-backed native checkpoints for all
  our param trees and optimizer states.
- ``load_torch_state_dict``: .ckpt (torch Lightning state_dict) and
  .safetensors (scripts/pub/V3D_512.py:145 / video_diffusion.py:123-133).
- ``split_svd_state_dict``: the key-prefix split the CLI performs on
  svd_xt.safetensors (V3D_512.py:145-162): CLIP tower / first-stage AE /
  video UNet.
- ``load_v3d_params``: full torch->flax conversion of a V3D/SVD checkpoint
  into our engine param trees via core.convert.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def load_torch_state_dict(path: str) -> Dict:
    """video_diffusion.py:128-133: .ckpt holds {'state_dict': ...};
    .safetensors is flat."""
    if path.endswith("ckpt") or path.endswith(".pt"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        return obj.get("state_dict", obj)
    if path.endswith("safetensors"):
        from safetensors.torch import load_file

        return load_file(path)
    raise NotImplementedError(path)


def split_svd_state_dict(sd: Dict) -> Dict[str, Dict]:
    """V3D_512.py:145-162 key-prefix split of one svd_xt/V3D checkpoint:

    - clip:   'conditioner.embedders.0.' subtree (FrozenOpenCLIPImage...)
    - ae:     'first_stage_model.' subtree (Encoder + VideoDecoder)
    - unet:   'model.diffusion_model.' subtree (VideoUNet)
    - other:  everything else (denoiser buffers, other embedders, ...)
    """
    out = {"clip": {}, "ae": {}, "unet": {}, "other": {}}
    for k, v in sd.items():
        if "conditioner.embedders.0." in k:
            out["clip"][k.split("conditioner.embedders.0.", 1)[1]] = v
        elif "first_stage_model." in k:
            out["ae"][k.split("first_stage_model.", 1)[1]] = v
        elif "model.diffusion_model." in k:
            out["unet"][k.split("model.diffusion_model.", 1)[1]] = v
        else:
            out["other"][k] = v
    return out


def load_v3d_params(path: str) -> Dict[str, Dict]:
    """Torch V3D/SVD checkpoint -> flax param trees for
    engines.builder.build_v3d_engine: {'unet', 'encoder', 'decoder', 'clip'}."""
    from v3d_tpu.core.convert import (
        convert_clip_visual,
        convert_vae,
        convert_video_unet,
    )

    sd = load_torch_state_dict(path)
    parts = split_svd_state_dict(sd)
    # the CLIP embedder nests the tower under open_clip.model.visual or
    # model.visual depending on wrapper (FrozenOpenCLIPImagePredictionEmbedder)
    clip_prefix = None
    for cand in ("open_clip.model.visual.", "model.visual."):
        if any(k.startswith(cand) for k in parts["clip"]):
            clip_prefix = cand
            break
    enc_sd = {k.split("encoder.", 1)[1]: v for k, v in parts["ae"].items()
              if k.startswith("encoder.")}
    dec_sd = {k.split("decoder.", 1)[1]: v for k, v in parts["ae"].items()
              if k.startswith("decoder.")}
    out = {
        "unet": {"params": convert_video_unet(parts["unet"])},
        "encoder": {"params": convert_vae(enc_sd)},
        "decoder": {"params": convert_vae(dec_sd, video_decoder=True)},
    }
    if clip_prefix is not None:
        out["clip"] = {"params": convert_clip_visual(parts["clip"],
                                                     prefix=clip_prefix)}
    return out
