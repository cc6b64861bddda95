"""Checkpoint IO tests: orbax roundtrip + svd-style torch checkpoint
splitting and conversion into engine param trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import install_reference

torch = pytest.importorskip("torch")


def test_orbax_roundtrip(tmp_path):
    from v3d_tpu.core.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
    save_pytree(str(tmp_path / "ckpt"), tree)
    out = load_pytree(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(out["a"], tree["a"])
    np.testing.assert_allclose(out["b"]["c"], tree["b"]["c"])


def test_split_and_convert_svd_checkpoint(tmp_path):
    """Assemble a small engine-style torch state dict with the reference's
    key layout, save as safetensors, and convert end-to-end."""
    install_reference()
    from safetensors.torch import save_file

    from sgm.modules.diffusionmodules.model import Encoder as RefEncoder
    from sgm.modules.autoencoding.temporal_ae import VideoDecoder as RefVideoDecoder
    from sgm.modules.diffusionmodules.video_model import VideoUNet as RefVideoUNet

    unet = RefVideoUNet(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1], channel_mult=[1, 2], num_head_channels=16,
        context_dim=64, adm_in_channels=32, num_classes="sequential",
        use_linear_in_transformer=True, extra_ff_mix_layer=True,
        use_spatial_context=True, merge_strategy="learned_with_images",
        video_kernel_size=[3, 1, 1], spatial_transformer_attn_type="softmax")
    kw = dict(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[], in_channels=3, resolution=32,
              z_channels=4, attn_type="vanilla")
    enc = RefEncoder(double_z=True, **kw)
    dec = RefVideoDecoder(video_kernel_size=[3, 1, 1], **kw)

    sd = {}
    for k, v in unet.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v.contiguous()
    for k, v in enc.state_dict().items():
        sd[f"first_stage_model.encoder.{k}"] = v.contiguous()
    for k, v in dec.state_dict().items():
        sd[f"first_stage_model.decoder.{k}"] = v.contiguous()
    # a couple of non-module keys routed to "other"
    sd["denoiser.sigmas"] = torch.zeros(10)
    path = str(tmp_path / "svd_small.safetensors")
    save_file(sd, path)

    from v3d_tpu.core.checkpoint import (
        load_torch_state_dict,
        load_v3d_params,
        split_svd_state_dict,
    )

    parts = split_svd_state_dict(load_torch_state_dict(path))
    assert len(parts["unet"]) == len(unet.state_dict())
    assert "denoiser.sigmas" in parts["other"]

    params = load_v3d_params(path)
    n_unet = sum(x.size for x in jax.tree_util.tree_leaves(params["unet"]))
    assert n_unet == sum(p.numel() for p in unet.parameters())
    n_enc = sum(x.size for x in jax.tree_util.tree_leaves(params["encoder"]))
    assert n_enc == sum(p.numel() for p in enc.parameters())
    n_dec = sum(x.size for x in jax.tree_util.tree_leaves(params["decoder"]))
    assert n_dec == sum(p.numel() for p in dec.parameters())

    # weights-day rehearsal: the first command of apps/validate_ckpt (split +
    # convert + count-parity assertions) must run end-to-end on an svd-style
    # checkpoint file
    import sys as _sys

    from v3d_tpu.apps import validate_ckpt

    argv = _sys.argv
    _sys.argv = ["validate_ckpt", "--ckpt", path]
    try:
        validate_ckpt.main()
    finally:
        _sys.argv = argv


def test_validate_ckpt_all_gates_cleanly(tmp_path):
    """apps/validate_ckpt --all on a directory with no recognizable weights
    must produce the one-file report with ok=True (absent artifacts are a
    PLAN, not failures — VERDICT r4 task 7): every absent artifact gets a
    plan entry naming its gate and the exact command, every optional stage
    is absent (not failed), and the λ_lpips=2.0 refpoint-fit command plus
    the >=40 dB sampling-loop gate appear in the plan."""
    import json

    from v3d_tpu.apps.validate_ckpt import check_all

    report_path = str(tmp_path / "report.json")
    report = check_all(str(tmp_path), report_path, refpoint_fit=False)
    assert report["ok"]  # nothing ran, nothing failed; plan emitted instead
    assert report["stages"] == {}
    # optional stages must be absent, not failed, when weights are missing
    for k in ("conversion", "lpips_ingest", "dpt_ingest", "u2net_ingest",
              "clip_ingest", "refpoint_fit_lpips"):
        assert k not in report["stages"]
    arts = {p["artifact"] for p in report["plan"]}
    assert any("V3D_512" in a for a in arts)
    assert any("LPIPS" in a for a in arts)
    blob = json.dumps(report["plan"])
    assert "40 dB" in blob                      # the sampling-loop gate
    assert "lambda_lpips=2.0" in blob           # the perceptual-term recipe
    assert "--lpips-npz" in blob                # the exact fit command
    on_disk = json.load(open(report_path))
    assert on_disk["stages"] == report["stages"]
    assert on_disk["plan"] == report["plan"]
