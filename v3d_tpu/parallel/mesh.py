"""Device mesh + sharding helpers — the TPU-native "distributed backend".

The reference's distributed story is Lightning DDP over NCCL (SURVEY.md
§2.10); here all cross-chip communication is XLA collectives over ICI,
declared through jax.sharding.  Axes:

- "data":  data parallelism (batch / frames).  For V3D inference the 18-frame
  orbit (CFG-doubled to 36) is sharded here: spatial UNet modules are
  embarrassingly parallel over frames, and XLA inserts the all-to-alls needed
  when temporal attention regroups ((b t), s, c) -> ((b s), t, c).
- "model": tensor parallelism (attention heads / MLP hidden).

Everything degrades gracefully to a 1-device mesh.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading dim on the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place every array's leading axis on the data axis (replicate scalars)."""

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), replicated(mesh)), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel param partitioning (rule-based over param paths)
# ---------------------------------------------------------------------------

# Default TP rules for the VideoUNet/transformer stack: shard attention QKV
# and MLP-in on the output feature dim, projections back on the input dim.
DEFAULT_TP_RULES = (
    (r".*/(to_q|to_k|to_v)/kernel$", P(None, MODEL_AXIS)),
    (r".*/to_out/kernel$", P(MODEL_AXIS, None)),
    (r".*/(net_0/proj|c_fc)/kernel$", P(None, MODEL_AXIS)),
    (r".*/(net_2|c_proj)/kernel$", P(MODEL_AXIS, None)),
    (r".*/in_proj/kernel$", P(None, MODEL_AXIS)),
)


def param_specs(params, rules=DEFAULT_TP_RULES) -> Dict:
    """PartitionSpec pytree for a param tree by path-regex rules; params not
    matching any rule are replicated."""

    def spec_for(path_str, leaf):
        for pattern, spec in rules:
            if re.match(pattern, path_str) and len(spec) == leaf.ndim:
                return spec
        return P()

    _, treedef = jax.tree_util.tree_flatten(params)
    specs = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        specs.append(spec_for(path_str, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    specs = param_specs(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
