"""Winograd F(2x2, 3x3) convolution — Pallas TPU kernel.

A 3x3 stride-1 SAME conv via the Winograd transform: 4x4 input tiles
(stride 2, halo 1) are transformed with B^T d B (shifted adds — B has
entries 0/±1), multiplied per tile-position against the pre-transformed
kernel U = G g G^T (16 independent (cin, cout) matmuls on the MXU), and
inverse-transformed with A^T m A to 2x2 output tiles: 2.25x fewer MACs
than direct convolution.

Kernel layout: the grid walks horizontal bands of 2 tile-rows; each
program instance holds the input band (with halo) in VMEM, so the V
tensor (the 16x data amplification that makes pure-XLA Winograd a wash —
it would round-trip HBM) never leaves VMEM.

Weights arrive pre-transformed (host-side, tiny) as (16, cin, cout).

Accumulation in f32; inputs/outputs bf16 (or f32 on CPU/interpret).

STATUS: RETIRED WITH DATA (round 2) — correct on TPU (bf16 rel err ~5e-3
vs lax.conv, exact in f32 interpret), but measured 9.25 ms at the V3D ds1
conv shape (36,64,64,320)->320 where XLA's conv inside the compiled UNet
runs at 2.0 ms (69% MFU with XLA-chosen layouts).  The VPU-side tile
transforms and relayouts dominate; the 2.25x MAC saving cannot close a
4.6x gap.  Kept as a tested reference implementation; NOT wired into the
models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# A^T (2x4), B^T (4x4), G (4x3) for F(2,3)
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) -> (16, cin, cout): U = G g G^T per channel pair."""
    g = jnp.asarray(_G)
    u = jnp.einsum("ab,bcij->acij", g, w)        # (4, 3, ci, co)
    u = jnp.einsum("acij,dc->adij", u, g)        # (4, 4, ci, co)
    return u.reshape(16, w.shape[2], w.shape[3])


def _band_kernel(x_ref, u_ref, o_ref, *, tw: int, cin: int, cout: int):
    """One band: x (1, 4, W+2, cin) -> o (1, 4, W, cout), W = 2*tw.

    The band holds 2 tile-rows: input rows r..r+5 cover output rows
    r..r+3 (tiles at rows r, r+2).  d-elements are read as shifted
    slices; V/M/Y never leave VMEM.
    """
    x = x_ref[0].astype(jnp.float32)              # (6, W+2, cin)
    wp2 = x.shape[1]

    # ---- input transform: V[u][v] (2, tw, cin) per (u, v), via B^T d B.
    # d[a][b] for tile (ty, tx) = x[2*ty + a, 2*tx + b].  Mosaic supports
    # no strided slicing, so split columns by parity with a reshape: the
    # stride-2 column walks become contiguous slices of the half-width
    # planes.
    xr = x.reshape(6, wp2 // 2, 2, cin)
    xe = xr[:, :, 0, :]                            # even cols (6, W/2+1, c)
    xo = xr[:, :, 1, :]                            # odd cols

    def d(a, b):
        src = xe if b % 2 == 0 else xo
        off = b // 2
        rows = jnp.stack([src[a], src[2 + a]])     # (2, W/2+1, cin)
        return rows[:, off:off + tw, :]            # (2, tw, cin)

    # B^T d B entries (standard F(2,3) expansion), 4 terms each
    dd = [[d(a, b) for b in range(4)] for a in range(4)]

    def bt_rows(col):
        c0, c1, c2, c3 = (dd[0][col], dd[1][col], dd[2][col], dd[3][col])
        return (c0 - c2, c1 + c2, c2 - c1, c1 - c3)

    cols = [bt_rows(b) for b in range(4)]          # cols[b][a] = (B^T d)[a][b]

    out_acc = jnp.zeros((2, 2 * tw, cout), jnp.float32)
    m = [[None] * 4 for _ in range(4)]
    for a in range(4):
        r0, r1, r2, r3 = (cols[0][a], cols[1][a], cols[2][a], cols[3][a])
        v_row = (r0 - r2, r1 + r2, r2 - r1, r1 - r3)   # (B^T d B)[a][:]
        for b in range(4):
            v = v_row[b].reshape(2 * tw, cin)           # (tiles, cin)
            m[a][b] = jax.lax.dot_general(
                v.astype(x_ref.dtype), u_ref[a * 4 + b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (tiles, cout)

    # ---- inverse transform Y = A^T m A -> (2, 2) outputs per tile
    # A^T rows: y0 = m0 + m1 + m2 ; y1 = m1 - m2 - m3 (per axis)
    def at_combine(q0, q1, q2, q3):
        return q0 + q1 + q2, q1 - q2 - q3

    # first over rows (a), then over cols (b)
    t = [None] * 4
    for b in range(4):
        t0, t1 = at_combine(m[0][b], m[1][b], m[2][b], m[3][b])
        t[b] = (t0, t1)
    y00, y01 = at_combine(t[0][0], t[1][0], t[2][0], t[3][0])
    y10, y11 = at_combine(t[0][1], t[1][1], t[2][1], t[3][1])
    # y{r}{c}: output pixel (r, c) within each 2x2 tile; shape (tiles, cout)
    # tiles = (2 tile-rows, tw tile-cols) flattened
    def put(y, r, c):
        y = y.reshape(2, tw, cout)
        return y

    o = jnp.zeros((4, 2 * tw, cout), jnp.float32)
    y00 = y00.reshape(2, tw, cout)
    y01 = y01.reshape(2, tw, cout)
    y10 = y10.reshape(2, tw, cout)
    y11 = y11.reshape(2, tw, cout)
    # interleave columns: even cols = y*0, odd = y*1
    row0 = jnp.stack([y00, y01], axis=2).reshape(2, 2 * tw, cout)
    row1 = jnp.stack([y10, y11], axis=2).reshape(2, 2 * tw, cout)
    # interleave rows: tile-row tr occupies output rows 2tr, 2tr+1
    o = jnp.stack([row0, row1], axis=1).reshape(4, 2 * tw, cout)
    o_ref[0] = o.astype(o_ref.dtype)


def winograd_conv3x3(x: jnp.ndarray, w: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x (N, H, W, cin), w (3, 3, cin, cout) -> SAME 3x3 conv (N, H, W,
    cout).  H and W must be even."""
    n, h, wd, cin = x.shape
    cout = w.shape[3]
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)
    tw = wd // 2
    u = transform_kernel(w).astype(x.dtype)
    # pad H and W by 1 each side (SAME halo)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # bands of 2 tile-rows: band r covers input rows 2*2r .. 2*2r+5 of xp.
    # Pallas blocks can't overlap, so pre-slice the overlapping bands into
    # a new leading axis host-side (cheap: one gather-free strided concat).
    n_bands = h // 4 if h % 4 == 0 else -(-h // 4)
    assert h % 4 == 0, ("H must be divisible by 4 for the band layout", h)
    bands = jnp.stack([
        jax.lax.dynamic_slice_in_dim(xp, 4 * r, 6, axis=1)
        for r in range(n_bands)], axis=1)           # (N, bands, 6, W+2, cin)
    bands = bands.reshape(n * n_bands, 6, wd + 2, cin)

    out = pl.pallas_call(
        functools.partial(_band_kernel, tw=tw, cin=cin, cout=cout),
        grid=(n * n_bands,),
        in_specs=[
            pl.BlockSpec((1, 6, wd + 2, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((16, cin, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, wd, cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n * n_bands, 4, wd, cout), x.dtype),
        interpret=interpret,
    )(bands, u)
    return out.reshape(n, h, wd, cout)
