"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication — the reference ships no test suite, so we
build our own: CPU XLA with ``--xla_force_host_platform_device_count=8`` lets
multi-chip sharding logic be exercised without TPU hardware.

The session environment pins a tunneled-TPU jax plugin via a PYTHONPATH
sitecustomize hook, which (a) makes jax default to the remote TPU and (b)
intercepts and ~17x slows even *CPU* XLA compiles.  Tests want plain local
CPU, so we re-exec the pytest process once with the hook stripped and the
platform forced to CPU.  Env vars can't simply be set here: pytest plugins
import jax before conftest runs.  The re-exec happens in pytest_configure
(after stopping output capture, so the child inherits the real stdout).
"""

import os
import sys

_MARKER = "V3D_TPU_TEST_REEXEC"

if os.environ.get(_MARKER) == "1":
    import jax

    jax.config.update("jax_threefry_partitionable", True)
    # this XLA CPU build defaults f32 matmuls/convs to reduced (bf16-level)
    # precision (~5e-3 rel error per op) — parity thresholds are meaningless
    # under that, so pin true f32 for the whole suite
    jax.config.update("jax_default_matmul_precision", "highest")
    assert jax.default_backend() == "cpu", jax.default_backend()
else:

    def pytest_configure(config):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env[_MARKER] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        )
        for k in list(env):
            if k.startswith(("PALLAS_AXON", "AXON_", "TPU_", "MEGASCALE")):
                env.pop(k)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
