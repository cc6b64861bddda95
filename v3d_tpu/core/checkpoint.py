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


# orbax refuses zero-size arrays (e.g. GS f_rest at sh_degree 0 is (N,0,3));
# mask them with a 1-byte marker on save and graft the target's empties back
# on restore — the pytree structure stays identical either way.
_EMPTY_MARK = np.zeros((1,), np.int8)


def _is_empty(x) -> bool:
    return hasattr(x, "size") and hasattr(x, "shape") and x.size == 0


def _mask_empty(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: _EMPTY_MARK if _is_empty(x) else x, tree)


def save_pytree(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _mask_empty(tree), force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        out = ckptr.restore(path, target=_mask_empty(target))
        return jax.tree_util.tree_map(
            lambda t, o: t if _is_empty(t) else o, target, out)
    return ckptr.restore(path)


def latest_checkpoint(ckpt_dir: str, prefix: str = "step_") -> Optional[str]:
    """Highest-step ``<ckpt_dir>/<prefix><N>`` orbax checkpoint, or None.

    The elastic-recovery entry point (SURVEY §5 lists the reference as having
    none; Lightning's --resume in mesh_recon/launch.py:127-131 is the closest
    analog): a preempted run restarted with the same command line picks up
    from the newest complete checkpoint.  Incomplete orbax saves (killed
    mid-write) are excluded via their tmp-dir markers.
    """
    if not os.path.isdir(ckpt_dir):
        return None
    best_step, best = -1, None
    for name in os.listdir(ckpt_dir):
        if not name.startswith(prefix):
            continue
        try:
            step = int(name[len(prefix):])
        except ValueError:
            continue
        path = os.path.join(ckpt_dir, name)
        # orbax finalizes atomically: in-progress saves live under a
        # *.orbax-checkpoint-tmp-* name or carry no commit marker yet
        if "orbax-checkpoint-tmp" in name or not os.path.isdir(path):
            continue
        if step > best_step:
            best_step, best = step, path
    return best


def prune_checkpoints(ckpt_dir: str, keep: int, prefix: str = "step_") -> None:
    """Keep the ``keep`` newest step checkpoints, delete the rest."""
    import shutil

    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith(prefix) and "tmp" not in name:
            try:
                steps.append((int(name[len(prefix):]), name))
            except ValueError:
                pass
    for _, name in sorted(steps)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


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
