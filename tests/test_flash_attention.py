"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.ops import flash_attention as fa
from v3d_tpu.ops.attention import xla_attention


def _run_interpret(q, k, v, bq, bk):
    return fa._flash_forward(q, k, v, bq, bk, interpret=True)


@pytest.mark.parametrize("sq,sk,d", [(256, 256, 64), (256, 512, 128)])
def test_flash_matches_xla(sq, sk, d):
    rs = np.random.RandomState(0)
    bh = 3
    q = jnp.asarray(rs.randn(bh, sq, d), jnp.float32)
    k = jnp.asarray(rs.randn(bh, sk, d), jnp.float32)
    v = jnp.asarray(rs.randn(bh, sk, d), jnp.float32)
    out = _run_interpret(q, k, v, 128, 128)
    ref = fa._xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_bf16_matches_f32_reference():
    """bf16 inputs take the single-MXU-pass path (dots in input dtype, f32
    accumulate); result must track the f32 reference to bf16 tolerance."""
    rs = np.random.RandomState(2)
    bh, sq, d = 2, 256, 64
    qf = rs.randn(bh, sq, d).astype(np.float32)
    kf = rs.randn(bh, sq, d).astype(np.float32)
    vf = rs.randn(bh, sq, d).astype(np.float32)
    out = _run_interpret(jnp.asarray(qf, jnp.bfloat16),
                         jnp.asarray(kf, jnp.bfloat16),
                         jnp.asarray(vf, jnp.bfloat16), 128, 128)
    assert out.dtype == jnp.bfloat16
    ref = fa._xla_reference(jnp.asarray(qf), jnp.asarray(kf), jnp.asarray(vf))
    err = np.abs(out.astype(np.float32) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err / scale < 0.03, err / scale


def test_flash_wrapper_fallback_shapes():
    # odd sequence length -> falls back to xla silently
    q = jnp.ones((1, 100, 2, 32))
    out = fa.flash_attention(q, q, q)
    ref = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_flash_backward_matches_xla():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(2, 256, 64), jnp.float32)
    k = jnp.asarray(rs.randn(2, 256, 64), jnp.float32)
    v = jnp.asarray(rs.randn(2, 256, 64), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(fa._xla_reference(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # custom vjp path (forward interpreted via monkeypatch)
    orig = fa._flash_forward
    fa.__dict__["_flash_forward"] = (
        lambda q, k, v, bq, bk, _orig=orig: _orig(q, k, v, bq, bk,
                                                  interpret=True))
    try:
        def loss_flash(q, k, v):
            return jnp.sum(fa._flash_bh(q, k, v, 128, 128) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa.__dict__["_flash_forward"] = orig
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_heads_native_parity_and_grads():
    """Heads-resident kernel (native (b,s,h,d) layout, per-head unrolled
    online softmax) vs the XLA reference, forward + custom-VJP grads."""
    import numpy as np

    from v3d_tpu.ops.flash_attention import (_flash_heads_forward,
                                             _xla_reference_bshd)

    rng = np.random.RandomState(3)
    b, s, h, d = 2, 256, 10, 64
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32))
    out = _flash_heads_forward(q, k, v, 128, 128, interpret=True)
    ref = _xla_reference_bshd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
