"""Full-asset pipeline with end-to-end wall-clock (VERDICT r4 task 6).

ONE command that runs the whole V3D asset path on one chip — image →
18-view 512² orbit video → 3DGS fit (reference budget, transient-free
recipe) → optional NeuS mesh — and records per-stage + total wall-clock
into benchmarks/results/full_asset_<tag>.json.  The reference paper claims
≈3 min/asset on one CUDA GPU (readme.md steps 3-5, arXiv:2403.06738); this
artifact is our measured counterpart.

    python -m v3d_tpu.apps.full_asset --input img.png --output asset/
    python -m v3d_tpu.apps.full_asset --input img.png --output asset/ --mesh
    python -m v3d_tpu.apps.full_asset --input img.png --output assets/ \
        --mesh --assets 2   # production steady-state: asset 2's row is the
                            # amortized per-asset cost (asset 1 pays the
                            # per-process compiles + executable loads)

Without --checkpoint the generation stage runs random-init weights (real
shapes/compute; pretrained ckpts are absent offline — the recon stages
then fit the random-init decode, which exercises the full per-asset
compute budget but not asset quality; quality is gated separately in
quality_refpoint_*.json).  Stage walls include each stage's jit compile,
as a fresh-process user would experience them (the generation program is
served from the persistent compile cache when warm; the GS/NeuS train
steps recompile per process on this toolchain).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run(input_path: str, output: str, checkpoint: str = None,
        gs_iters: int = 4000, neus_steps: int = 3000, mesh: bool = False,
        num_steps: int = 25, tag: str = "r5",
        mc_resolution: int = 192, assets: int = 1) -> dict:
    import numpy as np

    from v3d_tpu.utils.misc import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # process-global: covers every stage
    os.makedirs(output, exist_ok=True)
    report = {"input": input_path, "checkpoint": checkpoint,
              "weights": "pretrained" if checkpoint else
              "RANDOM-INIT (ckpts absent offline; wall-clock artifact only)",
              "assets": []}
    t_all = time.time()

    from glob import glob

    from v3d_tpu.apps.generate import sample_one
    from v3d_tpu.apps.recon_gs import train_from_video

    # assets > 1 measures the production steady-state: asset 1 pays the
    # per-process compiles and the compile-service executable (re)loads —
    # both outside this framework's control and highly variable on the
    # shared service (observed 104-625 s for the same cached generation
    # program) — while asset 2+ reuses the loaded engine programs, so its
    # row is the honest amortized per-asset cost a serving process sees.
    engine = params = None
    for i in range(assets):
        stages = {}
        t_asset = time.time()
        a_out = output if assets == 1 else os.path.join(output, f"a{i}")
        os.makedirs(a_out, exist_ok=True)

        # ---- stage 1: image -> 18-view orbit video (readme step 3)
        t0 = time.time()
        frames, engine, params = sample_one(
            input_path, checkpoint, num_steps=num_steps,
            output_folder=a_out, save=True, seed=23 + i,
            engine=engine, params=params)
        gen_s = time.time() - t0
        # sample_one writes sequentially-numbered mp4s; take the newest
        mp4s = sorted(glob(os.path.join(a_out, "*.mp4")),
                      key=os.path.getmtime)
        video_path = mp4s[-1]
        stages["generate_18view_512"] = round(gen_s, 1)
        print(f"[full_asset] a{i} generate: {gen_s:.1f}s -> {video_path}",
              flush=True)

        # ---- stage 2: video -> 3DGS (readme step 4; recon_gs defaults =
        # the shipped transient-free recipe at the reference budget)
        t0 = time.time()
        train_from_video(video_path, os.path.join(a_out, "gs"),
                         iterations=gs_iters, seed=i)
        gs_s = time.time() - t0
        stages[f"gs_fit_{gs_iters}"] = round(gs_s, 1)
        print(f"[full_asset] a{i} 3DGS fit: {gs_s:.1f}s", flush=True)

        # ---- stage 3 (optional): video -> NeuS SDF -> mesh (readme step 5)
        if mesh:
            from v3d_tpu.apps.recon_neus import reconstruct

            t0 = time.time()
            reconstruct(video_path, os.path.join(a_out, "mesh"),
                        max_steps=neus_steps, mc_resolution=mc_resolution,
                        seed=i)
            neus_s = time.time() - t0
            stages["neus_fit_mesh"] = round(neus_s, 1)
            print(f"[full_asset] a{i} NeuS fit+mesh: {neus_s:.1f}s",
                  flush=True)

        stages["asset_total_s"] = round(time.time() - t_asset, 1)
        report["assets"].append(stages)

    # backwards-compatible top-level view = the LAST asset (the amortized
    # one when assets > 1)
    report["stages"] = report["assets"][-1]
    report["total_s"] = round(time.time() - t_all, 1)
    report["per_asset_amortized_s"] = report["assets"][-1]["asset_total_s"]
    report["reference_claim_s"] = 180.0
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out_json = os.path.join(repo, "benchmarks", "results",
                            f"full_asset_{tag}.json")
    import sys
    sys.path.insert(0, repo)
    from benchmarks._io import write_json
    write_json(out_json, report)
    print(json.dumps(report), flush=True)
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--gs-iters", type=int, default=4000)
    p.add_argument("--neus-steps", type=int, default=3000)
    p.add_argument("--num-steps", type=int, default=25)
    p.add_argument("--mc-resolution", type=int, default=192)
    p.add_argument("--mesh", action="store_true",
                   help="also run the NeuS mesh stage (readme step 5)")
    p.add_argument("--assets", type=int, default=1,
                   help="run the pipeline N times in one process; the last "
                        "asset's row is the amortized production per-asset "
                        "cost (asset 1 pays per-process compiles/loads)")
    p.add_argument("--tag", default="r5")
    args = p.parse_args()
    run(args.input, args.output, args.checkpoint, args.gs_iters,
        args.neus_steps, args.mesh, args.num_steps, args.tag,
        args.mc_resolution, args.assets)


if __name__ == "__main__":
    main()
