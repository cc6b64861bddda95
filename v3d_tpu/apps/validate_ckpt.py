"""Weights-day validation harness.

Given the real checkpoints (svd_xt.safetensors / V3D_512.ckpt, absent in
this offline environment), verifies in one command that the conversion and
the TPU stack reproduce the reference:

  1. key-prefix split + per-component conversion (counts, shapes, no
     unrecognized keys)  [always]
  2. torch-vs-flax forward parity per component at small inputs, using the
     live reference under /root/reference  [--forward]
  3. full 25-step sampling-loop comparison: our generation vs the torch
     reference's latents from the same noise -> per-frame PSNR, target
     >= 40 dB  [--full-loop; CPU-slow]
  4. optional LPIPS / DPT npz ingestion checks  [--lpips / --dpt]

    python -m v3d_tpu.apps.validate_ckpt --ckpt ckpts/V3D_512.ckpt --forward

Reference anchors: scripts/pub/V3D_512.py:145-162 (split),
sgm/models/video_diffusion.py:123-168 (tolerant load).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _tree_count(tree) -> int:
    import jax
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def check_conversion(ckpt_path: str) -> dict:
    from v3d_tpu.core.checkpoint import (
        load_torch_state_dict,
        load_v3d_params,
        split_svd_state_dict,
    )

    sd = load_torch_state_dict(ckpt_path)
    parts = split_svd_state_dict(sd)
    print(f"checkpoint keys: {len(sd)}")
    for name, sub in parts.items():
        n = sum(int(np.prod(tuple(v.shape))) for v in sub.values())
        print(f"  {name:6s} {len(sub):5d} keys  {n/1e6:9.1f} M params")

    params = load_v3d_params(ckpt_path)
    for name, tree in params.items():
        print(f"converted {name:8s} -> {_tree_count(tree)/1e6:9.1f} M params")

    # count parity: converted trees must cover every torch param
    n_unet_t = sum(int(np.prod(tuple(v.shape))) for v in parts["unet"].values())
    n_unet_j = _tree_count(params["unet"])
    assert n_unet_j == n_unet_t, (n_unet_j, n_unet_t)
    print("UNet param count matches torch subtree ✓")
    return params


def check_forward(ckpt_path: str, params: dict) -> None:
    """Per-component torch-vs-flax forward checks with the REAL weights."""
    sys.path.insert(0, "tests")
    from ref_loader import install_reference

    install_reference()
    import torch

    import jax.numpy as jnp

    from v3d_tpu.core.checkpoint import (
        load_torch_state_dict,
        split_svd_state_dict,
    )
    from v3d_tpu.models.video_unet import VideoUNet

    sd = load_torch_state_dict(ckpt_path)
    parts = split_svd_state_dict(sd)

    from sgm.modules.diffusionmodules.video_model import VideoUNet as RefUNet

    ref = RefUNet(
        in_channels=8, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=[4, 2, 1], channel_mult=[1, 2, 4, 4],
        num_head_channels=64, context_dim=1024, adm_in_channels=768,
        num_classes="sequential", use_linear_in_transformer=True,
        extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        spatial_transformer_attn_type="softmax", use_checkpoint=False,
    )
    missing, unexpected = ref.load_state_dict(parts["unet"], strict=False)
    print(f"torch load: {len(missing)} missing, {len(unexpected)} unexpected")
    ref.eval()

    t, h, w = 2, 16, 16
    rs = np.random.RandomState(0)
    x = rs.randn(t, 8, h, w).astype(np.float32)
    ts = rs.rand(t).astype(np.float32) * 10
    ctx = rs.randn(t, 1, 1024).astype(np.float32) * 0.1
    y = rs.randn(t, 768).astype(np.float32) * 0.1
    ind = np.zeros((1, t), np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(ts),
                      context=torch.from_numpy(ctx), y=torch.from_numpy(y),
                      num_video_frames=t,
                      image_only_indicator=torch.from_numpy(ind)).numpy()
    jnet = VideoUNet(in_channels=8, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_head_channels=64,
                     context_dim=1024, adm_in_channels=768)
    out_jax = np.asarray(jnet.apply(
        params["unet"], jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y),
        num_video_frames=t, image_only_indicator=jnp.asarray(ind),
    )).transpose(0, 3, 1, 2)
    rel = np.abs(out_ref - out_jax).max() / (np.abs(out_ref).mean() + 1e-8)
    print(f"UNet forward rel deviation: {rel:.2e} "
          f"({'OK' if rel < 2e-3 else 'FAIL'})")
    assert rel < 2e-3


def check_full_loop(ckpt_path: str, steps: int = 25, t: int = 18,
                    latent_hw: int = 64, cfg_scale: float = 3.5) -> None:
    """Run the torch reference's 25-step EulerEDM loop (EDMDiscretization
    sigma_max=700, LinearPredictionGuider — the V3D_512.yaml recipe) and our
    lax.scan sampler from IDENTICAL noise+conditioning with the REAL UNet
    weights; report per-run latent PSNR (>=40 dB target).  Same machinery
    as tests/test_sampler_parity_torch.py, at full scale."""
    sys.path.insert(0, "tests")
    from ref_loader import install_reference

    install_reference()
    import torch

    import jax.numpy as jnp

    from v3d_tpu.core.checkpoint import (
        load_torch_state_dict,
        split_svd_state_dict,
    )

    from sgm.modules.diffusionmodules.denoiser import Denoiser as RefDenoiser
    from sgm.modules.diffusionmodules.sampling import EulerEDMSampler
    from sgm.modules.diffusionmodules.video_model import VideoUNet as RefUNet

    sd = load_torch_state_dict(ckpt_path)
    parts = split_svd_state_dict(sd)
    ref_net = RefUNet(
        in_channels=8, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=[4, 2, 1], channel_mult=[1, 2, 4, 4],
        num_head_channels=64, context_dim=1024, adm_in_channels=768,
        num_classes="sequential", use_linear_in_transformer=True,
        extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        spatial_transformer_attn_type="softmax", use_checkpoint=False)
    ref_net.load_state_dict(parts["unet"])
    ref_net.eval()
    ref_denoiser = RefDenoiser({
        "target":
        "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"})
    sampler = EulerEDMSampler(
        discretization_config={
            "target":
            "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0}},
        guider_config={
            "target":
            "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
            "params": {"max_scale": cfg_scale, "min_scale": cfg_scale,
                       "num_frames": t}},
        num_steps=steps, device="cpu")

    rs = np.random.RandomState(0)
    noise = rs.randn(t, 4, latent_hw, latent_hw).astype(np.float32)
    crossattn = rs.randn(1, 1, 1024).astype(np.float32) * 0.1
    concat = rs.randn(1, 4, latent_hw, latent_hw).astype(np.float32) * 0.1
    vector = rs.randn(t, 768).astype(np.float32) * 0.1
    c = {"crossattn": torch.from_numpy(crossattn).repeat(t, 1, 1),
         "concat": torch.from_numpy(concat).repeat(t, 1, 1, 1),
         "vector": torch.from_numpy(vector)}
    uc = {"crossattn": torch.zeros_like(c["crossattn"]),
          "concat": torch.zeros_like(c["concat"]),
          "vector": torch.from_numpy(vector)}
    indicator = torch.zeros(2, t)

    def denoiser_fn(x, sigma, cond):
        return ref_denoiser(
            lambda xx, tt, cc, **kw: ref_net(
                torch.cat([xx, cc["concat"]], 1), tt,
                context=cc["crossattn"], y=cc["vector"],
                num_video_frames=t, image_only_indicator=indicator),
            x, sigma, cond)

    with torch.no_grad():
        z_ref = sampler(denoiser_fn, torch.from_numpy(noise).clone(),
                        cond=c, uc=uc).numpy()

    from v3d_tpu.core.convert import convert_video_unet
    from v3d_tpu.diffusion.denoise import Denoiser
    from v3d_tpu.diffusion.discretize import EDMDiscretization
    from v3d_tpu.diffusion.guidance import LinearPredictionGuider
    from v3d_tpu.diffusion.sampling import EulerEDMSampler as JSampler
    from v3d_tpu.diffusion.scaling import VScalingWithEDMcNoise
    from v3d_tpu.engines.wrappers import make_unet_network_fn
    from v3d_tpu.models.video_unet import VideoUNet

    jnet = VideoUNet(in_channels=8, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_head_channels=64,
                     context_dim=1024, adm_in_channels=768)
    params = {"params": convert_video_unet(parts["unet"])}
    jc = {"crossattn": jnp.asarray(np.repeat(crossattn, t, 0)),
          "concat": jnp.asarray(np.repeat(concat, t, 0).transpose(0, 2, 3, 1)),
          "vector": jnp.asarray(vector)}
    juc = {"crossattn": jnp.zeros_like(jc["crossattn"]),
           "concat": jnp.zeros_like(jc["concat"]),
           "vector": jnp.asarray(vector)}
    jsampler = JSampler(
        discretization=EDMDiscretization(sigma_max=700.0), num_steps=steps,
        guider=LinearPredictionGuider(max_scale=cfg_scale,
                                      min_scale=cfg_scale, num_frames=t))
    jdenoiser = Denoiser(scaling=VScalingWithEDMcNoise())
    network = make_unet_network_fn(jnet.apply, params, t)
    jind = jnp.zeros((2, t))
    z = jsampler(
        lambda x, s, cond: jdenoiser(network, x, s, cond,
                                     image_only_indicator=jind),
        jnp.asarray(noise.transpose(0, 2, 3, 1)), jc, juc)
    z = np.asarray(z).transpose(0, 3, 1, 2)

    data_range = np.abs(z_ref).max()
    mse = np.mean((z_ref - z) ** 2)
    psnr = 20 * np.log10(data_range / np.sqrt(mse + 1e-12))
    print(f"sampling-loop PSNR: {psnr:.2f} dB "
          f"({'OK' if psnr >= 40 else 'FAIL'})")
    assert psnr >= 40.0


def check_all(ckpt_dir: str, report_path: str, refpoint_fit: bool) -> dict:
    """Weights-day one-command harness: given a directory of the real
    checkpoints, run every converter + parity gate + (optionally) the
    lambda_lpips=2.0 reference-recipe GS fit, and write ONE json report.

    Recognized filenames (any that exist are validated; missing are noted):
      V3D_512.ckpt / svd_xt.safetensors  -> conversion + forward + full-loop
      lpips_vgg.npz / vgg16.npz          -> LPIPS ingestion + smoke call
      omnidata_dpt_normal.ckpt/.npz      -> DPT normal predictor ingestion
      u2net.pth / u2net.npz              -> U2Net background-removal weights
      open_clip_vit_h.npz                -> CLIP tower for conditioner/safety
    """
    import glob
    import json
    import os
    import time

    report = {"dir": ckpt_dir, "stages": {}, "t_start": time.time()}

    def stage(name, fn):
        t0 = time.time()
        try:
            out = fn()
            report["stages"][name] = {"ok": True, "detail": out,
                                      "s": round(time.time() - t0, 1)}
            print(f"[all] {name}: OK ({time.time() - t0:.0f}s)")
        except Exception as e:  # keep going: one report for the whole day
            report["stages"][name] = {"ok": False, "error": str(e)[:500],
                                      "s": round(time.time() - t0, 1)}
            print(f"[all] {name}: FAIL - {e}")

    def find(*patterns):
        for pat in patterns:
            hits = sorted(glob.glob(os.path.join(ckpt_dir, pat)))
            if hits:
                return hits[0]
        return None

    main_ckpt = find("V3D_512.ckpt", "*.ckpt", "svd_xt*.safetensors",
                     "*.safetensors")
    lpips_w = find("lpips_vgg*.npz", "vgg16*.npz", "vgg*.npz")
    dpt_w = find("omnidata*dpt*", "dpt*.npz", "dpt*.ckpt")
    u2net_w = find("u2net*.npz", "u2net*.pth")
    clip_w = find("*clip*.npz")

    # Absent checkpoints become a PLAN, not a failure (VERDICT r4 task 7):
    # with an empty dir this harness documents exactly what runs on weights
    # day — the gate each artifact unlocks and the one command that runs it
    # — and exits 0.
    plan = []

    def planned(artifact, looked_for, gate, command):
        plan.append({"artifact": artifact, "looked_for": looked_for,
                     "gate": gate, "command": command})
        print(f"[plan] {artifact}: ABSENT (looked for {looked_for})\n"
              f"       gate: {gate}\n"
              f"       run:  {command}")

    if main_ckpt:
        holder = {}
        stage("conversion",
              lambda: holder.setdefault("p", check_conversion(main_ckpt))
              and "converted")
        stage("forward_parity",
              lambda: check_forward(main_ckpt, holder["p"]) or "rel<2e-3")
        stage("sampling_loop_40db",
              lambda: check_full_loop(main_ckpt) or ">=40dB")
    else:
        planned(
            "V3D_512.ckpt / svd_xt.safetensors",
            "V3D_512.ckpt, *.ckpt, svd_xt*.safetensors, *.safetensors",
            "key-prefix split conversion (V3D_512.py:145-162) + "
            "torch-vs-flax forward parity (rel<2e-3) + full 25-step "
            "sampling-loop parity, per-frame PSNR >= 40 dB",
            f"python -m v3d_tpu.apps.validate_ckpt --all {ckpt_dir}")

    if not lpips_w:
        planned(
            "LPIPS VGG weights", "lpips_vgg*.npz, vgg16*.npz, vgg*.npz",
            "LPIPS ingestion smoke + the V3D readme step-4 recipe's "
            "perceptual term: lambda_dssim=1.0 lambda_lpips=2.0 refpoint "
            "fit (train_from_vid.py:130-137), scored on holdout views",
            "python benchmarks/quality_bench.py --res 512 --gs-iters 4000 "
            "--skip-neus --gs-dssim 1.0 --lpips-npz "
            f"{ckpt_dir}/lpips_vgg.npz --tag refpoint_lpips   "
            f"(or: validate_ckpt --all {ckpt_dir} --refpoint-fit)")
    if not dpt_w:
        planned(
            "omnidata DPT normal ckpt", "omnidata*dpt*, dpt*.npz, dpt*.ckpt",
            "DPT normal-predictor ingestion; unlocks NeuS normal "
            "supervision (mesh_recon/datasets/v3d.py:173)",
            f"python -m v3d_tpu.apps.validate_ckpt --all {ckpt_dir}")
    if not u2net_w:
        planned(
            "U2Net weights", "u2net*.npz, u2net*.pth",
            "background-removal (rembg-equivalent) ingestion for "
            "preprocessing (V3D_512.py:210)",
            f"python -m v3d_tpu.apps.validate_ckpt --all {ckpt_dir}")
    if not clip_w:
        planned(
            "OpenCLIP ViT-H visual tower", "*clip*.npz",
            "CLIP conditioner + safety-head ingestion "
            "(encoders/modules.py:594; p_head/w_head npz)",
            f"python -m v3d_tpu.apps.validate_ckpt --all {ckpt_dir}")

    if lpips_w:
        def _lpips():
            import jax.numpy as jnp

            from v3d_tpu.metrics.lpips import load_lpips
            fn = load_lpips(lpips_w)
            assert fn is not None
            a = jnp.zeros((1, 64, 64, 3))
            b = jnp.ones((1, 64, 64, 3)) * 0.5
            d = float(fn(a, b))
            assert np.isfinite(d) and d > 0
            return f"lpips(black, gray)={d:.4f}"
        stage("lpips_ingest", _lpips)
    if dpt_w:
        def _dpt():
            from v3d_tpu.nerf.normals import load_dpt_normal_predictor
            assert load_dpt_normal_predictor(dpt_w) is not None
            return dpt_w
        stage("dpt_ingest", _dpt)
    if u2net_w:
        def _u2net():
            from v3d_tpu.models.u2net import load_u2net
            assert load_u2net(u2net_w) is not None
            return u2net_w
        stage("u2net_ingest", _u2net)
    if clip_w:
        def _clip():
            from v3d_tpu.core.checkpoint import load_torch_state_dict
            from v3d_tpu.core.convert import convert_clip_visual
            sd = (dict(np.load(clip_w)) if clip_w.endswith(".npz")
                  else load_torch_state_dict(clip_w))
            params = convert_clip_visual(sd, prefix="")
            return f"{_tree_count({'params': params})/1e6:.1f}M clip params"
        stage("clip_ingest", _clip)

    if refpoint_fit and lpips_w:
        # the V3D readme step-4 recipe with the perceptual term, finally
        # runnable: lambda_dssim=1.0 lambda_lpips=2.0 at the refpoint
        def _fit():
            import subprocess
            import sys as _sys
            rc = subprocess.call([
                _sys.executable, "benchmarks/quality_bench.py", "--res",
                "512", "--gs-iters", "4000", "--skip-neus",
                "--gs-dssim", "1.0", "--lpips-npz", lpips_w,
                "--tag", "refpoint_lpips"],
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))))
            assert rc == 0
            return "wrote benchmarks/results/quality_refpoint_lpips.json"
        stage("refpoint_fit_lpips", _fit)

    report["wall_s"] = round(time.time() - report["t_start"], 1)
    del report["t_start"]
    report["plan"] = plan
    # ok = every stage that actually RAN passed; absent artifacts are plan
    # entries, not failures (empty dir -> full plan printed, exit 0)
    report["ok"] = all(s.get("ok") for s in report["stages"].values())
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    status = "ALL OK" if report["ok"] else "FAILURES PRESENT"
    if plan:
        status += f"; {len(plan)} artifact(s) absent -> plan above"
    print(f"[all] report -> {report_path}  ({status})")
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None,
                   help="svd_xt.safetensors or V3D_512.ckpt")
    p.add_argument("--all", default=None, metavar="CKPT_DIR",
                   help="weights-day mode: validate every recognized ckpt "
                        "in the directory and write one report")
    p.add_argument("--report", default="validate_ckpt_report.json",
                   help="report path for --all")
    p.add_argument("--refpoint-fit", action="store_true",
                   help="with --all: also run the lambda_lpips=2.0 "
                        "reference-recipe GS fit (slow)")
    p.add_argument("--forward", action="store_true",
                   help="torch-vs-flax forward parity with real weights")
    p.add_argument("--full-loop", action="store_true",
                   help="25-step sampling comparison (very slow on CPU)")
    p.add_argument("--lpips", default=None, help="LPIPS VGG npz to ingest")
    p.add_argument("--dpt", default=None, help="omnidata DPT ckpt to ingest")
    args = p.parse_args()

    if args.all:
        rep = check_all(args.all, args.report, args.refpoint_fit)
        sys.exit(0 if rep["ok"] else 1)

    if not args.ckpt:
        sys.exit("need --ckpt (or --all CKPT_DIR)")
    params = check_conversion(args.ckpt)
    if args.forward:
        check_forward(args.ckpt, params)
    if args.full_loop:
        check_full_loop(args.ckpt)
    if args.lpips:
        from v3d_tpu.metrics.lpips import load_lpips
        assert load_lpips(args.lpips) is not None
        print("LPIPS weights ingested ✓")
    if args.dpt:
        from v3d_tpu.nerf.normals import load_dpt_normal_predictor
        assert load_dpt_normal_predictor(args.dpt) is not None
        print("DPT weights ingested ✓")
    print("validate_ckpt: done")


if __name__ == "__main__":
    main()
