"""Winograd F(2,3) conv kernel: exact parity vs lax.conv in f32
(interpret mode).  The kernel is retired from the hot path (see its
docstring) but stays correct."""

import numpy as np

import jax
import jax.numpy as jnp

from v3d_tpu.ops.winograd import winograd_conv3x3


def test_winograd_matches_lax_conv():
    rng = np.random.RandomState(0)
    for (n, h, w_, ci, co) in [(2, 8, 8, 5, 7), (1, 16, 12, 8, 8)]:
        x = jnp.asarray(rng.randn(n, h, w_, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = winograd_conv3x3(x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
