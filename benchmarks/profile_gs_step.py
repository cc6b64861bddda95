"""Profile one 3DGS train iteration on the TPU and dump the per-op
breakdown (parsed from the raw xplane trace — the tensorboard converter in
this env is broken, see profile_unet_step.py history).

    python benchmarks/profile_gs_step.py [outdir]
"""

import collections
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs_profile"
    os.makedirs(outdir, exist_ok=True)

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))

    from v3d_tpu.data.cameras import orbit_cameras
    from v3d_tpu.gs.trainer import GSTrainConfig, GSTrainer

    res, num_pts = 512, 100_000
    frames = [np.random.RandomState(i).rand(res, res, 3).astype(np.float32)
              for i in range(18)]
    cams = orbit_cameras(18, resolution=res, images=frames)
    cfg = GSTrainConfig(densify_from_iter=10**9, opacity_reset_interval=10**9)
    trainer = GSTrainer(cams, cfg, num_pts=num_pts,
                        capacity=int(num_pts * 1.5))
    trainer.train_iter(0)  # compile
    t0 = time.perf_counter()
    for i in range(5):
        trainer.train_iter(i % 18)
    float(np.asarray(trainer.params["xyz"][:1]).sum())
    print(f"steady iter: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)

    tracedir = os.path.join(outdir, "trace")
    with jax.profiler.trace(tracedir):
        for i in range(3):
            trainer.train_iter(i % 18)
        float(np.asarray(trainer.params["xyz"][:1]).sum())

    xplanes = []
    for root, _, files in os.walk(tracedir):
        xplanes += [os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb")]
    if not xplanes:
        print("no xplane captured")
        return

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xplanes[0], "rb").read())
    for plane in space.planes:
        if plane.name != "/device:TPU:0":
            continue
        cat = collections.Counter()
        catn = collections.Counter()
        named = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                n = md.name
                if n.startswith("jit_"):
                    continue
                m = re.match(r"%([a-zA-Z_\-]+)", n)
                key = m.group(1) if m else n[:30]
                cat[key] += ev.duration_ps / 1e9 / 3.0
                catn[key] += 1
                named[n[:100]] += ev.duration_ps / 1e9 / 3.0
        print("\nper-iter ms by op category (3 iters averaged):")
        for k, v in cat.most_common(20):
            print(f"  {v:9.2f} ms  x{catn[k]//3:<5d} {k}")
        print("\ntop individual ops:")
        for k, v in named.most_common(15):
            print(f"  {v:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
