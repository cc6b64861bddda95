"""Fused temporal attention: kernel correctness (pallas interpret mode on
CPU), custom-VJP gradients, and the packed variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.ops.attention import xla_attention
from v3d_tpu.ops.temporal_attention import (
    _pallas_core,
    _xla_core,
    temporal_attention,
    temporal_attention_packed,
    temporal_core,
)


def _qkv(shape, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(*shape).astype(np.float32))
                 for _ in range(3))


def test_xla_core_matches_reference_layout():
    b, t, h, d = 5, 18, 2, 8
    q, k, v = _qkv((b, t, h, d))
    ref = np.asarray(xla_attention(q, k, v))

    def to_core(x):
        return x.transpose(1, 3, 0, 2).reshape(t, d, b * h)

    out = _xla_core(to_core(q), to_core(k), to_core(v))
    out = np.asarray(out).reshape(t, d, b, h).transpose(2, 0, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_core_interpret_matches_xla_core():
    t, d, n = 18, 16, 40
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(t, d, n).astype(np.float32))
               for _ in range(3))
    ref = np.asarray(_xla_core(q, k, v))
    got = np.asarray(_pallas_core(q, k, v, block=16, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_temporal_core_grads_match_xla():
    t, d, n = 6, 8, 12
    rng = np.random.RandomState(2)
    q, k, v = (jnp.asarray(rng.randn(t, d, n).astype(np.float32))
               for _ in range(3))

    def loss_core(q, k, v):
        return jnp.sum(temporal_core(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_core(q, k, v) ** 2)

    g1 = jax.grad(loss_core, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batched_apis_match_xla_attention():
    shape = (30, 18, 3, 16)
    q, k, v = _qkv(shape, seed=3)
    ref = np.asarray(xla_attention(q, k, v))
    got_t = np.asarray(temporal_attention(q, k, v, block_b=64))
    got_p = np.asarray(temporal_attention_packed(q, k, v, pack=7))
    np.testing.assert_allclose(got_t, ref, atol=1e-4)
    np.testing.assert_allclose(got_p, ref, atol=1e-4)


def test_temporal_self_attention_module_equivalence():
    """TemporalSelfAttention on (b,t,s,c) == CrossAttention on the legacy
    ((b s), t, c) rearrangement with tied weights."""
    from v3d_tpu.models.attention_blocks import CrossAttention
    from v3d_tpu.models.video_attention import TemporalSelfAttention

    b, t, s, c = 2, 6, 10, 32
    heads, dh = 4, 8
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(b, t, s, c).astype(np.float32))

    fused = TemporalSelfAttention(heads, dh)
    params = fused.init(jax.random.PRNGKey(0), x)
    out_fused = np.asarray(fused.apply(params, x))

    legacy = CrossAttention(heads, dh)
    x_legacy = jnp.asarray(
        np.transpose(np.asarray(x), (0, 2, 1, 3)).reshape(b * s, t, c))
    out_legacy = legacy.apply(params, x_legacy)
    out_legacy = np.asarray(out_legacy).reshape(b, s, t, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out_fused, out_legacy, atol=2e-5)


def test_temporal_cross_attention_matches_repeated_context():
    """TemporalCrossAttention with per-video context == legacy CrossAttention
    with the context repeated per pixel (video_attention.py:244-253)."""
    from v3d_tpu.models.attention_blocks import CrossAttention
    from v3d_tpu.models.video_attention import TemporalCrossAttention

    b, t, s, c, sc, cd = 2, 5, 7, 24, 3, 16
    heads, dh = 3, 8
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(b, t, s, c).astype(np.float32))
    ctx = jnp.asarray(rng.randn(b, sc, cd).astype(np.float32))

    fused = TemporalCrossAttention(heads, dh)
    params = fused.init(jax.random.PRNGKey(1), x, ctx)
    out_fused = np.asarray(fused.apply(params, x, ctx))

    legacy = CrossAttention(heads, dh)
    x_legacy = jnp.asarray(
        np.transpose(np.asarray(x), (0, 2, 1, 3)).reshape(b * s, t, c))
    ctx_rep = jnp.repeat(ctx, s, axis=0)          # ((b s), sc, cd)
    out_legacy = legacy.apply(params, x_legacy, ctx_rep)
    out_legacy = np.asarray(out_legacy).reshape(b, s, t, c).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out_fused, out_legacy, atol=2e-5)
