"""Fused GroupNorm(+SiLU) Pallas kernel for the UNet hot path.

The reference evaluates GroupNorm32 in f32 before almost every conv
(sgm/modules/diffusionmodules/util.py:274-277, openaimodel.py:220-365).
XLA's lowering of the stats pass on this toolchain materializes
convert_reduce fusions that measured 137 ms of the 457 ms denoise step
(benchmarks/profile_unet_step, r4 trace) — ~25x off bandwidth-bound.

Design (TPU): two streaming passes over HBM, each a Pallas kernel with a
1D folded grid (this toolchain only allows varying block indices on the
leading grid dim — CLAUDE.md):

1. stats: per-(sample, channel) sum and sum-of-squares accumulated across
   row-blocks (channels ride the 128-lane dim — a 10-wide group straddling
   lanes never appears).
2. a microscopic XLA group-combine on the (B, C) partials -> per-channel
   mean / inv-std folded with the affine params.
3. normalize: x * a + b with optional fused SiLU epilogue, one read + one
   write.

Totals 2 reads + 1 write of the activation — the two-pass optimum (a
single-pass variant would need the whole per-sample slice resident; 5D
temporal GN slices are 47MB > VMEM).

Measured outcome (benchmarks/results/gn_bench_r4.json): the 137 ms of
convert_reduce fusions in the trace turned out to be conv+GN-stat FUSIONS
(the convs are inside them — ARCHITECTURE.md §4b); standalone XLA GN is
already bandwidth-bound (0.295 ms at the ds1 shape) and this Pallas
pipeline is ~2x that.  **XLA is therefore the default backend**; the
kernels remain as forceable A/B backends only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

_FORCE_BACKEND = os.environ.get("V3D_GN_BACKEND") or None  # None=auto |
#                                  "pallas" | "xla" (tests/benchmarks A/B)


def set_default_backend(name):
    global _FORCE_BACKEND
    assert name in (None, "auto", "pallas", "xla")
    _FORCE_BACKEND = None if name == "auto" else name


def _row_block(L: int, C: int) -> int:
    """Row-block size: ~1MB working tile, multiple of 16 sublanes, divides L
    (L here is always a power-of-two multiple of 16 or smaller than 16)."""
    target = max(16, (1 << 20) // (2 * C))
    bl = 16
    while bl * 2 <= min(target, L) and L % (bl * 2) == 0:
        bl *= 2
    return min(bl, L)


def _stats_kernel(x_ref, s1_ref, s2_ref, *, n_l):
    i = pl.program_id(0)
    xf = x_ref[0].astype(jnp.float32)                 # (BL, C)
    s1 = jnp.sum(xf, axis=0, keepdims=True)[None]     # (1, 1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)[None]

    @pl.when(i % n_l == 0)
    def _init():
        s1_ref[...] = s1
        s2_ref[...] = s2

    @pl.when(i % n_l != 0)
    def _acc():
        s1_ref[...] += s1
        s2_ref[...] += s2


def _norm_kernel(x_ref, a_ref, b_ref, o_ref, *, silu):
    xf = x_ref[0].astype(jnp.float32)                 # (BL, C)
    y = xf * a_ref[0] + b_ref[0]                      # broadcast (1, C)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "silu",
                                             "interpret"))
def _pallas_group_norm(x3, scale, bias, num_groups, eps, silu, interpret):
    """x3: (B, L, C) -> normalized (+SiLU) in x3.dtype."""
    B, L, C = x3.shape
    G = num_groups
    BL = _row_block(L, C)
    n_l = L // BL
    grid = (B * n_l,)

    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, n_l=n_l),
        out_shape=(jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, C), jnp.float32)),
        grid=grid,
        in_specs=[pl.BlockSpec((1, BL, C), lambda i: (i // n_l, i % n_l, 0))],
        out_specs=(pl.BlockSpec((1, 1, C), lambda i: (i // n_l, 0, 0)),
                   pl.BlockSpec((1, 1, C), lambda i: (i // n_l, 0, 0))),
        interpret=interpret,
    )(x3)
    s1 = s1[:, 0]
    s2 = s2[:, 0]

    # group combine + affine fold (tiny, XLA): per-channel a = inv*scale,
    # b = bias - mean*inv*scale so the second pass is one FMA per element
    n = L * (C // G)
    g1 = jnp.sum(s1.reshape(B, G, C // G), axis=-1)
    g2 = jnp.sum(s2.reshape(B, G, C // G), axis=-1)
    mean = g1 / n
    var = jnp.maximum(g2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, C // G, axis=-1)        # (B, C)
    inv_c = jnp.repeat(inv, C // G, axis=-1)
    a = (inv_c * scale[None])[:, None]                # (B, 1, C)
    b = bias[None, None] - mean_c[:, None] * a

    out = pl.pallas_call(
        functools.partial(_norm_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BL, C), lambda i: (i // n_l, i % n_l, 0)),
            pl.BlockSpec((1, 1, C), lambda i: (i // n_l, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i: (i // n_l, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BL, C), lambda i: (i // n_l, i % n_l, 0)),
        interpret=interpret,
    )(x3, a, b)
    return out


def _reference(x, scale, bias, num_groups, eps, silu):
    """XLA path (ChannelPartialGroupNorm math, models/layers.py:43-85)."""
    C = x.shape[-1]
    G = num_groups
    xf = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    n_per_ch = int(np.prod([x.shape[d] for d in red])) if red else 1
    s1 = jnp.sum(xf, axis=red)
    s2 = jnp.sum(xf * xf, axis=red)
    B = s1.shape[0]
    g1 = jnp.sum(s1.reshape(B, G, C // G), axis=-1)
    g2 = jnp.sum(s2.reshape(B, G, C // G), axis=-1)
    n = n_per_ch * (C // G)
    mean = g1 / n
    var = jnp.maximum(g2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, C // G, axis=-1)
    inv_c = jnp.repeat(inv, C // G, axis=-1)
    shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = (xf - mean_c.reshape(shape)) * (inv_c.reshape(shape) * scale) + bias
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _supported(x) -> bool:
    if x.ndim < 3:
        return False
    C = x.shape[-1]
    L = int(np.prod(x.shape[1:-1]))
    # C < 128 under-fills the lane dim (VAE tails go to XLA); L must be a
    # multiple of the 16-sublane base block so row-blocks tile exactly
    return C >= 128 and L >= 16 and L % 16 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_act(x, scale, bias, num_groups=32, eps=1e-5,
                   silu: bool = False):
    """GroupNorm in f32 (+ optional fused SiLU), output in x.dtype.

    Default backend is the XLA formula on every platform: the on-chip A/B
    (benchmarks/results/gn_bench_r4.json) showed standalone XLA GN already
    near bandwidth-bound, with the two-kernel Pallas pipeline ~2x slower.
    The Pallas kernels stay forceable via ``set_default_backend`` /
    ``V3D_GN_BACKEND`` for in-program layout A/Bs.  Gradients always go
    through the XLA formula (jax.vjp recompute) — GN backward is off the
    generation hot path.
    """
    return _gn_fwd_impl(x, scale, bias, num_groups, eps, silu)


def _gn_fwd_impl(x, scale, bias, num_groups, eps, silu):
    backend = _FORCE_BACKEND
    if backend is None:
        # measured (benchmarks/results/gn_bench_r4.json): standalone XLA GN
        # is already near bandwidth-bound (0.295 ms at the ds1 shape) and the
        # two-kernel Pallas pipeline is ~2x that, so XLA stays the default;
        # the kernel remains forceable for in-program layout A/Bs
        backend = "xla"
    if backend == "pallas" and _supported(x):
        B = x.shape[0]
        C = x.shape[-1]
        x3 = x.reshape(B, -1, C)
        out = _pallas_group_norm(x3, scale, bias, num_groups, eps, silu,
                                 False)
        return out.reshape(x.shape)
    return _reference(x, scale, bias, num_groups, eps, silu)


def _gn_fwd(x, scale, bias, num_groups, eps, silu):
    return _gn_fwd_impl(x, scale, bias, num_groups, eps, silu), (x, scale, bias)


def _gn_bwd(num_groups, eps, silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _reference(x, s, b, num_groups, eps, silu),
        x, scale, bias)
    return vjp(g)


group_norm_act.defvjp(_gn_fwd, _gn_bwd)
