"""Fused GroupNorm(+SiLU) kernel parity (interpret mode) vs the XLA
reference formula, and the custom-VJP gradient path."""

import numpy as np

import jax
import jax.numpy as jnp

from v3d_tpu.ops.fused_groupnorm import (_pallas_group_norm, _reference,
                                         group_norm_act)


def _mk(shape, C, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    return x, scale, bias


def test_pallas_matches_reference():
    for shape, silu in (((3, 16, 16, 320), True),
                        ((2, 4, 8, 8, 256), False),
                        ((3, 64, 640), True)):
        C = shape[-1]
        x, scale, bias = _mk(shape, C)
        ref = _reference(x, scale, bias, 32, 1e-5, silu)
        x3 = x.reshape(shape[0], -1, C)
        out = _pallas_group_norm(x3, scale, bias, 32, 1e-5, silu,
                                 True).reshape(shape)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_bf16_roundtrip():
    x, scale, bias = _mk((2, 32, 32, 320), 320)
    xb = x.astype(jnp.bfloat16)
    ref = _reference(xb, scale, bias, 32, 1e-5, True)
    out = _pallas_group_norm(xb.reshape(2, -1, 320), scale, bias, 32, 1e-5,
                             True, True).reshape(x.shape)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-2)


def test_custom_vjp_grads():
    x, scale, bias = _mk((2, 8, 8, 128), 128)

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_act(x, s, b, 32, 1e-5, True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_reference(x, s, b, 32, 1e-5, True) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
