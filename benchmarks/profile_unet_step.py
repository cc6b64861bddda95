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

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "op_profile", "hlo_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {})
            path = os.path.join(outdir, tool + ".json")
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            with open(path, "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            print("wrote", path, flush=True)
        except Exception as e:  # tool coverage differs across versions
            print(f"{tool}: failed ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
