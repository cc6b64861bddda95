"""Mesh/sharding helper tests on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from v3d_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    batch_sharding,
    make_mesh,
    param_specs,
    replicate,
    shard_batch,
    shard_params,
)


def test_make_mesh_shapes():
    mesh = make_mesh(model=1)
    assert mesh.devices.shape == (len(jax.devices()), 1)
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.devices.shape == (4, 2)
    assert mesh2.axis_names == ("data", "model")


def test_shard_batch_and_replicate():
    mesh = make_mesh(model=1)
    batch = {"x": np.zeros((16, 4)), "s": np.asarray(3.0)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == P("data", None)
    assert out["s"].sharding.spec == P()
    rep = replicate({"w": np.ones((3, 3))}, mesh)
    assert rep["w"].sharding.spec == P()


def test_tp_param_specs():
    params = {
        "blocks_0": {
            "attn1": {"to_q": {"kernel": jnp.zeros((64, 64))},
                      "to_out": {"kernel": jnp.zeros((64, 64)),
                                 "bias": jnp.zeros((64,))}},
            "ff": {"net_0": {"proj": {"kernel": jnp.zeros((64, 512))}},
                   "net_2": {"kernel": jnp.zeros((256, 64))}},
        },
        "conv": {"kernel": jnp.zeros((3, 3, 8, 16))},
    }
    specs = param_specs(params, DEFAULT_TP_RULES)
    assert specs["blocks_0"]["attn1"]["to_q"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["attn1"]["to_out"]["kernel"] == P("model", None)
    assert specs["blocks_0"]["attn1"]["to_out"]["bias"] == P()
    assert specs["blocks_0"]["ff"]["net_0"]["proj"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["ff"]["net_2"]["kernel"] == P("model", None)
    assert specs["conv"]["kernel"] == P()

    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh)
    q = sharded["blocks_0"]["attn1"]["to_q"]["kernel"]
    assert q.sharding.spec == P(None, "model")
