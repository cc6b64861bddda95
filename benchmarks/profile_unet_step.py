"""Profile one CFG-doubled UNet denoise step on the TPU and dump a per-op
time breakdown (tensorboard_plugin_profile parsing of the xplane trace).

Usage: python benchmarks/profile_unet_step.py [outdir]
Writes: outdir/trace/... (raw), outdir/op_breakdown.json, prints top ops.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unet_profile"
    os.makedirs(outdir, exist_ok=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))

    import __graft_entry__ as g

    fn, args = g.entry()
    jfn = jax.jit(fn)

    t0 = time.time()
    out = jfn(*args)
    _ = np.asarray(out[0, 0, 0, 0])  # host-fetch sync (see CLAUDE.md)
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    for _ in range(2):
        t0 = time.time()
        out = jfn(*args)
        _ = np.asarray(out[0, 0, 0, 0])
        print(f"steady step: {time.time() - t0:.3f}s", flush=True)

    tracedir = os.path.join(outdir, "trace")
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            out = jfn(*args)
        _ = np.asarray(out[0, 0, 0, 0])

    # locate the xplane file
    xplanes = []
    for root, _, files in os.walk(tracedir):
        xplanes += [os.path.join(root, f) for f in files
                    if f.endswith(".xplane.pb")]
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return

    # Parse the xplane proto DIRECTLY (the tensorboard-plugin converter is
    # broken in this env — protobuf descriptor mismatch; CLAUDE.md r4).
    # Only the synchronous "XLA Ops" line counts: the "Async XLA Ops" line
    # holds copy-start/done spans that OVERLAP compute (summing them
    # overstates the step ~4x).
    import collections
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xplanes[0], "rb").read())
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        cat = collections.Counter()
        catn = collections.Counter()
        named = collections.Counter()
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                n = md.name
                m = re.match(r"%?([a-zA-Z_\-]+)", n)
                key = m.group(1) if m else n[:30]
                ms = ev.duration_ps / 1e9 / 3.0
                cat[key] += ms
                catn[key] += 1
                named[n[:110]] += ms
                total += ms
        print(f"\nXLA Ops total: {total:.1f} ms/step (3 steps averaged)")
        for k, v in cat.most_common(25):
            print(f"  {v:9.2f} ms  x{catn[k]//3:<5d} {k}")
        print("\ntop individual ops:")
        for k, v in named.most_common(15):
            print(f"  {v:9.2f} ms  {k[:100]}")
        path = os.path.join(outdir, "op_breakdown.json")
        from benchmarks._io import write_json
        write_json(path, {
            "total_ms_per_step": round(total, 1),
            "categories_ms": {k: round(v, 2) for k, v in cat.most_common(40)},
            "counts_per_step": {k: catn[k] // 3 for k, _ in cat.most_common(40)},
            "top_ops_ms": {k: round(v, 2) for k, v in named.most_common(40)},
        })
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
