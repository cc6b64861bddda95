"""Profile one NeuS train step on the TPU (xplane parsing as in
profile_gs_step.py).

    python benchmarks/profile_neus_step.py [outdir]
"""

import collections
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/neus_profile"
    os.makedirs(outdir, exist_ok=True)

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))

    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    res, rays, samples = 512, 1024, 1024
    poses = get_uniform_poses(18, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    images = np.zeros((18, res, res, 3), np.float32)
    fg = np.ones((18, res, res), np.float32)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg = NeusConfig(num_samples_per_ray=samples, train_num_rays=rays,
                     max_train_num_rays=rays, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=1.0,
                     geometry_encoding="frequency",
                     grad_type="analytic_fwd" if on_tpu else "finite_difference",
                     geo_neurons=128, geo_hidden_layers=4,
                     use_occ_lookup=False, ray_chunk=128)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg)
    trainer.train_iter()
    t0 = time.perf_counter()
    for _ in range(5):
        trainer.train_iter()
    float(np.asarray(trainer.params["variance"]["params"]["variance"]))
    print(f"steady step: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)

    tracedir = os.path.join(outdir, "trace")
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            trainer.train_iter()
        float(np.asarray(trainer.params["variance"]["params"]["variance"]))

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
        for line in plane.lines:
            tot = collections.Counter()
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                tot[md.name[:110]] += ev.duration_ps / 1e9 / 3.0
            if not tot:
                continue
            print(f"\n== line '{line.name}' total "
                  f"{sum(tot.values()):.1f} ms/step")
            for k, v in tot.most_common(14):
                print(f"  {v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
