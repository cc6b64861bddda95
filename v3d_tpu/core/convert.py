"""Torch checkpoint -> JAX pytree weight conversion.

The reference ships its weights as svd_xt.safetensors / V3D_512.ckpt torch
state dicts (scripts/pub/V3D_512.py:145-162 splits one file by key prefix
into CLIP / AE / engine).  This module translates those key layouts into our
flax param trees:

- Linear:  torch (out, in)            -> flax kernel (in, out)      [transpose]
- Conv2d:  torch (O, I, kh, kw)       -> flax kernel (kh, kw, I, O)
- Conv3d:  torch (O, I, kt, kh, kw)   -> flax kernel (kt, kh, kw, I, O)
- GroupNorm/LayerNorm: weight -> scale

Each converter is a pure function state_dict -> nested param dict and raises
on unrecognized keys so checkpoint drift is caught loudly.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def t2j(t) -> np.ndarray:
    """torch tensor -> numpy (f32)."""
    return np.asarray(t.detach().cpu().float().numpy())


def _linear_w(t):
    return t2j(t).T


def _conv2_w(t):
    return t2j(t).transpose(2, 3, 1, 0)


def _conv3_w(t):
    return t2j(t).transpose(2, 3, 4, 1, 0)


def _set(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ---------------------------------------------------------------------------
# sub-module translators: given the remainder of a torch key, return
# (flax subpath, transform) or None
# ---------------------------------------------------------------------------

def _norm_path(name: str, kind: str, param: str) -> Tuple[str, ...]:
    inner = "GroupNorm_0" if kind == "gn" else "LayerNorm_0"
    leaf = {"weight": "scale", "bias": "bias"}[param]
    return (name, inner, leaf)


def _map_linear(name: str, param: str):
    if param == "weight":
        return (name, "kernel"), _linear_w
    return (name, "bias"), t2j


def _map_conv(name: str, param: str, dims: int = 2):
    if param == "weight":
        return (name, "kernel"), _conv2_w if dims == 2 else _conv3_w
    return (name, "bias"), t2j


def _map_plain_resblock(rest: str, prefix: Tuple[str, ...], dims: int = 2):
    """torch ResBlock (openaimodel.py:220) -> flax models.layers.ResBlock."""
    m = re.match(r"in_layers\.0\.(weight|bias)$", rest)
    if m:
        return prefix + _norm_path("in_norm", "gn", m.group(1)), t2j
    m = re.match(r"in_layers\.2\.(weight|bias)$", rest)
    if m:
        p, f = _map_conv("in_conv", m.group(1), dims)
        return prefix + p, f
    m = re.match(r"emb_layers\.1\.(weight|bias)$", rest)
    if m:
        p, f = _map_linear("emb_linear", m.group(1))
        return prefix + p, f
    m = re.match(r"out_layers\.0\.(weight|bias)$", rest)
    if m:
        return prefix + _norm_path("out_norm", "gn", m.group(1)), t2j
    m = re.match(r"out_layers\.3\.(weight|bias)$", rest)
    if m:
        p, f = _map_conv("out_conv", m.group(1), dims)
        return prefix + p, f
    m = re.match(r"skip_connection\.(weight|bias)$", rest)
    if m:
        p, f = _map_conv("skip_conv", m.group(1), dims)
        return prefix + p, f
    return None


def _map_video_resblock(rest: str, prefix: Tuple[str, ...]):
    """video_model.py VideoResBlock: spatial ResBlock fields live at the top
    level, temporal ones under time_stack., plus time_mixer.mix_factor."""
    if rest == "time_mixer.mix_factor":
        return prefix + ("time_mixer", "mix_factor"), t2j
    if rest.startswith("time_stack."):
        return _map_plain_resblock(rest[len("time_stack."):],
                                   prefix + ("time_stack",), dims=3)
    return _map_plain_resblock(rest, prefix + ("spatial",), dims=2)


def _map_cross_attention(rest: str, prefix: Tuple[str, ...]):
    m = re.match(r"to_(q|k|v)\.weight$", rest)
    if m:
        return prefix + (f"to_{m.group(1)}", "kernel"), _linear_w
    m = re.match(r"to_out\.0\.(weight|bias)$", rest)
    if m:
        p, f = _map_linear("to_out", m.group(1))
        return prefix + p, f
    return None


def _map_feedforward(rest: str, prefix: Tuple[str, ...]):
    m = re.match(r"net\.0\.proj\.(weight|bias)$", rest)
    if m:
        p, f = _map_linear("proj", m.group(1))
        return prefix + ("net_0",) + p, f
    m = re.match(r"net\.2\.(weight|bias)$", rest)
    if m:
        p, f = _map_linear("net_2", m.group(1))
        return prefix + p, f
    return None


def _map_transformer_block(rest: str, prefix: Tuple[str, ...]):
    """BasicTransformerBlock / VideoTransformerBlock fields."""
    for attn in ("attn1", "attn2"):
        if rest.startswith(attn + "."):
            return _map_cross_attention(rest[len(attn) + 1:], prefix + (attn,))
    for norm in ("norm_in", "norm1", "norm2", "norm3"):
        m = re.match(norm + r"\.(weight|bias)$", rest)
        if m:
            return prefix + _norm_path(norm, "ln", m.group(1)), t2j
    if rest.startswith("ff_in."):
        return _map_feedforward(rest[len("ff_in."):], prefix + ("ff_in",))
    if rest.startswith("ff."):
        return _map_feedforward(rest[len("ff."):], prefix + ("ff",))
    return None


def _map_spatial_video_transformer(rest: str, prefix: Tuple[str, ...]):
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return prefix + _norm_path("norm", "gn", m.group(1)), t2j
    m = re.match(r"proj_(in|out)\.(weight|bias)$", rest)
    if m:
        p, f = _map_linear(f"proj_{m.group(1)}", m.group(2))
        return prefix + p, f
    m = re.match(r"time_pos_embed\.(0|2)\.(weight|bias)$", rest)
    if m:
        p, f = _map_linear(f"time_pos_embed_{m.group(1)}", m.group(2))
        return prefix + p, f
    if rest == "time_mixer.mix_factor":
        return prefix + ("time_mixer", "mix_factor"), t2j
    m = re.match(r"transformer_blocks\.(\d+)\.(.*)$", rest)
    if m:
        return _map_transformer_block(m.group(2), prefix + (f"blocks_{m.group(1)}",))
    m = re.match(r"time_stack\.(\d+)\.(.*)$", rest)
    if m:
        return _map_transformer_block(m.group(2), prefix + (f"time_stack_{m.group(1)}",))
    return None


def _map_unet_layer(rest: str, prefix: Tuple[str, ...]):
    """Translate one layer inside a TimestepEmbedSequential."""
    # Downsample / Upsample
    m = re.match(r"op\.(weight|bias)$", rest)
    if m:
        p, f = _map_conv("op", m.group(1))
        return prefix + p, f
    m = re.match(r"conv\.(weight|bias)$", rest)
    if m:
        p, f = _map_conv("conv", m.group(1))
        return prefix + p, f
    # plain conv (input_blocks.0.0)
    m = re.match(r"(weight|bias)$", rest)
    if m:
        p, f = _map_conv(prefix[-1], m.group(1))
        return prefix[:-1] + p, f
    out = _map_spatial_video_transformer(rest, prefix)
    if out is not None:
        return out
    return _map_video_resblock(rest, prefix)


def convert_video_unet(state_dict: Dict) -> Dict:
    """Torch VideoUNet state_dict -> flax params for models.video_unet.VideoUNet.

    Key skeleton mirrors video_model.py:84-440; our flax names in_{i}_{j} /
    mid_{j} / out_{i}_{j} use the same (block, layer) indices as torch's
    input_blocks.{i}.{j} / middle_block.{j} / output_blocks.{i}.{j}.
    """
    tree: Dict = {}
    unknown = []
    for key, val in state_dict.items():
        out = _convert_unet_key(key)
        if out is None:
            unknown.append(key)
            continue
        path, fn = out
        _set(tree, path, fn(val))
    if unknown:
        raise KeyError(f"unrecognized VideoUNet keys: {unknown[:10]} "
                       f"(+{max(0, len(unknown) - 10)} more)")
    return tree


def _convert_unet_key(key: str):
    m = re.match(r"time_embed\.(0|2)\.(weight|bias)$", key)
    if m:
        return _map_linear(f"time_embed_{m.group(1)}", m.group(2))
    m = re.match(r"label_emb\.0\.(0|2)\.(weight|bias)$", key)
    if m:
        return _map_linear(f"label_emb_{m.group(1)}", m.group(2))
    m = re.match(r"out\.0\.(weight|bias)$", key)
    if m:
        return _norm_path("out_norm", "gn", m.group(1)), t2j
    m = re.match(r"out\.2\.(weight|bias)$", key)
    if m:
        return _map_conv("out_conv", m.group(1))
    m = re.match(r"input_blocks\.(\d+)\.(\d+)\.(.*)$", key)
    if m:
        return _map_unet_layer(m.group(3), (f"in_{m.group(1)}_{m.group(2)}",))
    m = re.match(r"middle_block\.(\d+)\.(.*)$", key)
    if m:
        return _map_unet_layer(m.group(2), (f"mid_{m.group(1)}",))
    m = re.match(r"output_blocks\.(\d+)\.(\d+)\.(.*)$", key)
    if m:
        return _map_unet_layer(m.group(3), (f"out_{m.group(1)}_{m.group(2)}",))
    return None


# ---------------------------------------------------------------------------
# VAE converters (sgm/modules/diffusionmodules/model.py + temporal_ae.py)
# ---------------------------------------------------------------------------

def _conv1x1_to_dense(t):
    w = t2j(t)  # (O, I, 1, 1)
    return w[:, :, 0, 0].T


def _map_vae_resnet(rest: str, prefix: Tuple[str, ...], video: bool):
    """ResnetBlock (model.py:144) fields; in VideoResBlockAE (temporal_ae.py)
    the spatial fields live under our 'spatial' submodule and temporal ones
    under 'time_stack'."""
    if video:
        if rest == "mix_factor":
            return prefix + ("mix_factor",), t2j
        if rest.startswith("time_stack."):
            return _map_plain_resblock(rest[len("time_stack."):],
                                       prefix + ("time_stack",), dims=3)
        prefix = prefix + ("spatial",)
    for norm in ("norm1", "norm2"):
        m = re.match(norm + r"\.(weight|bias)$", rest)
        if m:
            return prefix + _norm_path(norm, "gn", m.group(1)), t2j
    for conv in ("conv1", "conv2", "conv_shortcut"):
        m = re.match(conv + r"\.(weight|bias)$", rest)
        if m:
            p, f = _map_conv(conv, m.group(1))
            return prefix + p, f
    m = re.match(r"nin_shortcut\.(weight|bias)$", rest)
    if m:
        p, f = _map_conv("nin_shortcut", m.group(1))
        return prefix + p, f
    return None


def _map_vae_attn(rest: str, prefix: Tuple[str, ...]):
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return prefix + _norm_path("norm", "gn", m.group(1)), t2j
    m = re.match(r"(q|k|v|proj_out)\.(weight|bias)$", rest)
    if m:
        name, param = m.group(1), m.group(2)
        if param == "weight":
            return prefix + (name, "kernel"), _conv1x1_to_dense
        return prefix + (name, "bias"), t2j
    return None


def _convert_vae_key(key: str, video_decoder: bool):
    m = re.match(r"conv_in\.(weight|bias)$", key)
    if m:
        return _map_conv("conv_in", m.group(1))
    m = re.match(r"norm_out\.(weight|bias)$", key)
    if m:
        return _norm_path("norm_out", "gn", m.group(1)), t2j
    m = re.match(r"conv_out\.(weight|bias)$", key)
    if m:
        p, f = _map_conv("conv", m.group(1))
        return (("conv_out",) + p, f) if video_decoder else _map_conv("conv_out", m.group(1))
    m = re.match(r"conv_out\.time_mix_conv\.(weight|bias)$", key)
    if m:
        p, f = _map_conv("time_mix_conv", m.group(1), dims=3)
        return ("conv_out",) + p, f
    m = re.match(r"(down|up)\.(\d+)\.block\.(\d+)\.(.*)$", key)
    if m:
        d, i, j, rest = m.groups()
        return _map_vae_resnet(rest, (f"{d}_{i}_block_{j}",),
                               video=video_decoder)
    m = re.match(r"(down|up)\.(\d+)\.attn\.(\d+)\.(.*)$", key)
    if m:
        d, i, j, rest = m.groups()
        return _map_vae_attn(rest, (f"{d}_{i}_attn_{j}",))
    m = re.match(r"down\.(\d+)\.downsample\.conv\.(weight|bias)$", key)
    if m:
        p, f = _map_conv("conv", m.group(2))
        return (f"down_{m.group(1)}_downsample",) + p, f
    m = re.match(r"up\.(\d+)\.upsample\.conv\.(weight|bias)$", key)
    if m:
        p, f = _map_conv("conv", m.group(2))
        return (f"up_{m.group(1)}_upsample",) + p, f
    m = re.match(r"mid\.(block_1|block_2)\.(.*)$", key)
    if m:
        return _map_vae_resnet(m.group(2), (f"mid_{m.group(1)}",),
                               video=video_decoder)
    m = re.match(r"mid\.attn_1\.(.*)$", key)
    if m:
        return _map_vae_attn(m.group(1), ("mid_attn_1",))
    return None


def convert_vae(state_dict: Dict, video_decoder: bool = False) -> Dict:
    """Torch Encoder/Decoder/VideoDecoder state_dict -> flax params for
    models.vae.{Encoder,Decoder,VideoDecoder}."""
    tree: Dict = {}
    unknown = []
    for key, val in state_dict.items():
        out = _convert_vae_key(key, video_decoder)
        if out is None:
            unknown.append(key)
            continue
        path, fn = out
        _set(tree, path, fn(val))
    if unknown:
        raise KeyError(f"unrecognized VAE keys: {unknown[:10]} "
                       f"(+{max(0, len(unknown) - 10)} more)")
    return tree


# ---------------------------------------------------------------------------
# CLIP visual tower converter (open_clip VisionTransformer state dict, keys
# as they appear inside FrozenOpenCLIPImageEmbedder: "model.visual.*")
# ---------------------------------------------------------------------------

def convert_clip_visual(state_dict: Dict, prefix: str = "model.visual.") -> Dict:
    """open_clip ViT visual weights -> flax params for models.clip_vit."""
    tree: Dict = {}
    unknown = []
    for key, val in state_dict.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        out = _convert_clip_key(k)
        if out is None:
            unknown.append(k)
            continue
        path, fn = out
        _set(tree, path, fn(val))
    if unknown:
        raise KeyError(f"unrecognized CLIP keys: {unknown[:10]}")
    return tree


def _convert_clip_key(k: str):
    if k == "conv1.weight":
        return ("conv1", "kernel"), _conv2_w
    if k == "class_embedding":
        return ("class_embedding",), t2j
    if k == "positional_embedding":
        return ("positional_embedding",), t2j
    if k == "proj":
        return ("proj",), t2j  # stored as (width, out) already
    for ln in ("ln_pre", "ln_post"):
        m = re.match(ln + r"\.(weight|bias)$", k)
        if m:
            return _norm_path(ln, "ln", m.group(1)), t2j
    m = re.match(r"transformer\.resblocks\.(\d+)\.(.*)$", k)
    if m:
        i, rest = m.groups()
        prefix = (f"resblocks_{i}",)
        for ln in ("ln_1", "ln_2"):
            mm = re.match(ln + r"\.(weight|bias)$", rest)
            if mm:
                return prefix + _norm_path(ln, "ln", mm.group(1)), t2j
        if rest == "attn.in_proj_weight":
            return prefix + ("attn", "in_proj", "kernel"), _linear_w
        if rest == "attn.in_proj_bias":
            return prefix + ("attn", "in_proj", "bias"), t2j
        mm = re.match(r"attn\.out_proj\.(weight|bias)$", rest)
        if mm:
            p, f = _map_linear("out_proj", mm.group(1))
            return prefix + ("attn",) + p, f
        mm = re.match(r"mlp\.(c_fc|c_proj)\.(weight|bias)$", rest)
        if mm:
            p, f = _map_linear(mm.group(1), mm.group(2))
            return prefix + p, f
    return None


def expand_unet_input_channels(unet_params: Dict, new_in_channels: int) -> Dict:
    """Channel-expansion checkpoint surgery
    (sgm/models/video3d_diffusion.py:131-146): when the target UNet has more
    input channels than the checkpoint (extra conditioning planes), the input
    conv kernel is zero-padded on the input-channel dim, keeping the original
    channels' weights."""
    import jax.numpy as jnp

    tree = unet_params["params"] if "params" in unet_params else unet_params
    kernel = tree["in_0_0"]["kernel"]  # (kh, kw, in, out)
    cur = kernel.shape[2]
    if cur == new_in_channels:
        return unet_params
    assert new_in_channels > cur, "can only expand input channels"
    pad = np.zeros(kernel.shape[:2] + (new_in_channels - cur,
                                       kernel.shape[3]), np.float32)
    tree["in_0_0"]["kernel"] = np.concatenate([np.asarray(kernel), pad], axis=2)
    return unet_params


# ---------------------------------------------------------------------------
# DPT (Omnidata normal/depth) converter — mesh_recon/utils/dpt.py:1009-1041
# loads omnidata_dpt_normal_v2.ckpt into DPTDepthModel(vitb_rn50_384);
# this maps that torch state dict onto models.dpt.DPT's param tree.
# ---------------------------------------------------------------------------

def _dpt_gn(prefix: Tuple[str, ...], param: str):
    return prefix + ("GroupNorm_0", {"weight": "scale", "bias": "bias"}[param])


def convert_dpt(state_dict: Dict) -> Dict:
    """torch DPTDepthModel state dict -> flax DPT params (models/dpt.py).

    Accepts either the raw checkpoint dict or one with the Lightning
    'model.' prefix already stripped (the reference strips k[6:],
    dpt.py:1052-1058).
    """
    tree: Dict = {}
    for key, t in state_dict.items():
        if key.startswith("model."):
            key = key[6:]
        parts = key.split(".")
        if key.startswith("pretrained.model."):
            rest = parts[2:]
            pre = ("pretrained",)
            if rest[0] in ("cls_token", "pos_embed"):
                _set(tree, pre + (rest[0],), t2j(t)); continue
            if rest[0] == "norm":  # final ViT LN: hooks fire before it
                continue
            if rest[0] == "patch_embed":
                if rest[1] == "proj":
                    path, tr = _map_conv("patch_proj", rest[2])
                    _set(tree, pre + path, tr(t)); continue
                # backbone resnet
                bb = pre + ("backbone",)
                if rest[2] == "stem":
                    if rest[3] == "conv":
                        _set(tree, bb + ("stem_conv", "kernel"), _conv2_w(t))
                    else:
                        _set(tree, _dpt_gn(bb + ("stem_norm",), rest[4]), t2j(t))
                    continue
                if rest[2] == "stages":
                    s, b = rest[3], rest[5]
                    blk = bb + (f"stage{s}_block{b}",)
                    name = rest[6]
                    if name.startswith("conv"):
                        _set(tree, blk + (name, "kernel"), _conv2_w(t))
                    elif name.startswith("norm"):
                        _set(tree, _dpt_gn(blk + (name,), rest[7]), t2j(t))
                    elif name == "downsample":
                        if rest[7] == "conv":
                            _set(tree, blk + ("down_conv", "kernel"), _conv2_w(t))
                        else:
                            _set(tree, _dpt_gn(blk + ("down_norm",), rest[8]),
                                 t2j(t))
                    else:
                        raise KeyError(key)
                    continue
                raise KeyError(key)
            if rest[0] == "blocks":
                i, name = rest[1], rest[2]
                blk = pre + (f"vit_block{i}",)
                if name in ("norm1", "norm2"):
                    _set(tree, blk + (name,
                         {"weight": "scale", "bias": "bias"}[rest[3]]), t2j(t))
                elif name == "attn":
                    sub = {"qkv": "qkv", "proj": "attn_proj"}[rest[3]]
                    path, tr = _map_linear(sub, rest[4])
                    _set(tree, blk + path, tr(t))
                elif name == "mlp":
                    path, tr = _map_linear(rest[3], rest[4])
                    _set(tree, blk + path, tr(t))
                else:
                    raise KeyError(key)
                continue
            raise KeyError(key)
        if key.startswith("pretrained.act_postprocess"):
            n = parts[1][-1]  # 3 or 4
            if n not in ("3", "4"):
                raise KeyError(key)
            if parts[2] == "0":  # ProjectReadout .project.0 Linear
                path, tr = _map_linear(f"readout{n}_proj", parts[5])
            elif parts[2] == "3":  # 1x1 conv
                path, tr = _map_conv(f"post{n}_conv", parts[3])
            elif parts[2] == "4":  # 3x3 stride-2 conv (postprocess4 only)
                path, tr = _map_conv("post4_down", parts[3])
            else:
                raise KeyError(key)
            _set(tree, ("pretrained",) + path, tr(t)); continue
        if key.startswith("scratch.layer") and key.endswith("_rn.weight"):
            _set(tree, (parts[1], "kernel"), _conv2_w(t)); continue
        if key.startswith("scratch.refinenet"):
            rf = (parts[1],)
            if parts[2] == "out_conv":
                path, tr = _map_conv("out_conv", parts[3])
            elif parts[2].startswith("resConfUnit"):
                rcu = "rcu" + parts[2][-1]
                path, tr = _map_conv(parts[3], parts[4])
                path = (rcu,) + path
            else:
                raise KeyError(key)
            _set(tree, rf + path, tr(t)); continue
        if key.startswith("scratch.output_conv."):
            idx = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}[parts[2]]
            path, tr = _map_conv(idx, parts[3])
            _set(tree, path, tr(t)); continue
        raise KeyError(f"unrecognized DPT key: {key}")
    return {"params": tree}


def convert_resunet(state_dict: Dict) -> Dict:
    """PixelNeRF ResUNet image encoder weights
    (sgm/modules/encoders/image_encoder.py:200-349) -> models.pixelnerf_encoder
    flax params.  BatchNorm runs with track_running_stats=False upstream, so
    the state_dict has only affine scale/bias (no running stats to carry)."""
    tree: Dict = {}
    bn_leaf = {"weight": "scale", "bias": "bias"}
    for key, t in state_dict.items():
        parts = key.split(".")
        if key in ("conv1.weight",):
            _set(tree, ("conv1", "kernel"), _conv2_w(t)); continue
        if parts[0] == "bn1":
            _set(tree, ("bn1", bn_leaf[parts[1]]), t2j(t)); continue
        if parts[0].startswith("layer"):
            li, bi = parts[0][-1], parts[1]
            blk = (f"layer{li}_block{bi}",)
            if parts[2] in ("conv1", "conv2"):
                _set(tree, blk + (parts[2], "kernel"), _conv2_w(t))
            elif parts[2] in ("bn1", "bn2"):
                _set(tree, blk + (parts[2], bn_leaf[parts[3]]), t2j(t))
            elif parts[2] == "downsample":
                if parts[3] == "0":
                    _set(tree, blk + ("down_conv", "kernel"), _conv2_w(t))
                else:
                    _set(tree, blk + ("down_bn", bn_leaf[parts[4]]), t2j(t))
            else:
                raise KeyError(key)
            continue
        if parts[0] in ("upconv3", "upconv2", "iconv3", "iconv2"):
            name = parts[0]
            # upconvN wraps conv: keys are upconvN.conv.conv.* / .conv.bn.*;
            # iconvN keys are iconvN.conv.* / iconvN.bn.*
            sub = parts[2] if name.startswith("upconv") else parts[1]
            leaf = parts[-1]
            if sub == "conv":
                tr = _conv2_w if leaf == "weight" else t2j
                _set(tree, (name, "conv", "kernel" if leaf == "weight" else "bias"), tr(t))
            elif sub == "bn":
                _set(tree, (name, "bn", bn_leaf[leaf]), t2j(t))
            else:
                raise KeyError(key)
            continue
        if parts[0] == "out_conv":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            tr = _conv2_w if parts[1] == "weight" else t2j
            _set(tree, ("out_conv", leaf), tr(t)); continue
        raise KeyError(f"unrecognized ResUNet key: {key}")
    return {"params": tree}


def convert_u2net(state_dict: Dict) -> Dict:
    """torch U2NET/U2NETP state dict (xuebinqin/U-2-Net naming, the model
    inside rembg's u2net.onnx) -> flax U2Net params (models/u2net.py).

    Layout: ``stageN[d].rebnconvM[d].{conv_s1,bn_s1}.*``, ``sideN.*``,
    ``outconv.*``.  BatchNorm running statistics become plain params
    (bn_mean/bn_var) — the flax module applies them as an eval-mode affine.
    """
    bn_leaf = {"weight": "bn_scale", "bias": "bn_bias",
               "running_mean": "bn_mean", "running_var": "bn_var"}
    tree: Dict = {}
    for key, t in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        if parts[0].startswith("side") or parts[0] == "outconv":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            tr = _conv2_w if parts[1] == "weight" else t2j
            _set(tree, (parts[0], leaf), tr(t))
            continue
        if parts[0].startswith("stage") and len(parts) == 4:
            stage, block, sub, leaf = parts
            if sub == "conv_s1":
                tr = _conv2_w if leaf == "weight" else t2j
                _set(tree, (stage, block, "conv",
                            "kernel" if leaf == "weight" else "bias"), tr(t))
            elif sub == "bn_s1":
                _set(tree, (stage, block, bn_leaf[leaf]), t2j(t))
            else:
                raise KeyError(f"unrecognized U2Net key: {key}")
            continue
        raise KeyError(f"unrecognized U2Net key: {key}")
    return {"params": tree}
