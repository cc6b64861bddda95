"""Fused Pallas TPU tile compositor for the 3DGS rasterizer.

Replaces the XLA ``lax.scan`` streaming compositor in ``gs/render.py``
(itself the TPU recast of the CUDA ``diff-gaussian-rasterization`` forward
kernel, recon/gaussian_renderer/__init__.py:22-134).  Same math — EWA
splat alpha compositing with the CUDA cutoffs (1/255 alpha floor, 0.99
clamp, T < 1e-4 stop) — but as one kernel per 16x16 tile with:

- the whole per-coarse-cell slab resident in VMEM (attr-major
  ``(n_cells, 16, Kc)``), shared across the cell's fine tiles by ordering
  the grid cell-major so Mosaic's pipeliner skips the re-fetch;
- a per-tile depth-chunk ``while_loop`` bounded by BOTH the CUDA early
  exit (every pixel's transmittance below 1e-4) and the cell's LIVE
  gaussian count.  The count bound is where most of the round-4 speedup
  comes from: measured at the reference operating point
  (benchmarks/results/gs_kernel_stats_r4_base.json) the early exit never
  fires (uncovered pixels keep T=1 forever), while 12 of 16 coarse cells
  hold <100 live gaussians yet composited all 32 DEAD-padded chunks;
- the forward checkpoints each chunk's starting transmittance row (and the
  stop chunk) to HBM, so the backward runs a SINGLE reverse sweep — the
  round-3 backward re-ran the whole forward recurrence first (3.5x fwd);
- all per-pair math on ``(256 pixels, 128 gaussians)`` f32 registers:
  exclusive cumprod along lanes via log2(D) Hillis-Steele rounds of
  ``pltpu.roll``, rgb/alpha/depth accumulated with a single
  ``(5,D)x(256,D)^T`` MXU contraction per chunk.

Orientation note: pixels ride the sublanes, gaussians the lanes; every
cross-orientation product is phrased as a dot_general so no vector
transposes are ever needed (the one scalar-ish exception, the final
per-pixel T row, uses an identity-matmul transpose).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P = TILE * TILE          # pixels per tile
D = 128                  # gaussians per depth chunk (lane width)
ATTR = 16                # padded attribute rows: [mx,my,ca,cb,cc,r,g,b,op,dpt]
_ALPHA_MIN = 1.0 / 255.0
_ALPHA_MAX = 0.99
_T_EPS = 1e-4


def _shift_right_fill(x, s, fill, lane_iota):
    """x[:, j] <- x[:, j-s], lanes j < s filled with ``fill``."""
    rolled = pltpu.roll(x, s, axis=1)
    return jnp.where(lane_iota < s, fill, rolled)


def _fwd_kernel(cnt_ref, cells_ref, xy_ref, slab_ref, o_ref, ts_ref, *,
                n_chunks):
    i = pl.program_id(0)
    x0 = xy_ref[i, 0].astype(jnp.float32)
    y0 = xy_ref[i, 1].astype(jnp.float32)
    k_max = jnp.minimum(cnt_ref[i], n_chunks)

    pix_lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pix_lin % TILE).astype(jnp.float32) + x0      # (P, 1)
    py = (pix_lin // TILE).astype(jnp.float32) + y0
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (P, D), 1)

    def chunk_step(k, T, out5):
        ch = slab_ref[0, :, pl.ds(k * D, D)]            # (ATTR, D)
        alpha, _, _, _, _, _ = _recompute_alpha(ch, px, py)
        om = 1.0 - alpha
        # exclusive cumprod along lanes (Hillis-Steele)
        y = _shift_right_fill(om, 1, 1.0, lane_iota)
        s = 1
        while s < D:
            y = y * _shift_right_fill(y, s, 1.0, lane_iota)
            s *= 2
        T_excl = T * y                                   # (P, D)
        live = T_excl >= _T_EPS
        w = jnp.where(live, alpha * T_excl, 0.0)
        # rgb / acc / depth in one MXU contraction: (5, D) x (P, D)^T
        b5 = jnp.concatenate(
            [ch[5:8, :], jnp.ones((1, D), jnp.float32), ch[9:10, :]], axis=0)
        out5 = out5 + jax.lax.dot_general(
            b5, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (5, P)
        # full chunk product from the exclusive cumprod's last lane
        # (Mosaic has no reduce_prod)
        T = T * (y[:, D - 1:] * om[:, D - 1:])           # (P, 1)
        return T, out5

    def cond(state):
        k, T, _ = state
        return (k < k_max) & (jnp.max(T) >= _T_EPS)

    def body(state):
        k, T, out5 = state
        # checkpoint the chunk's STARTING transmittance row for the backward
        ts_ref[0, pl.ds(k, 1), :] = _transpose_col_to_row(T)
        T, out5 = chunk_step(k, T, out5)
        return k + 1, T, out5

    k0 = jnp.asarray(0, jnp.int32)
    T0 = jnp.ones((P, 1), jnp.float32)
    o0 = jnp.zeros((5, P), jnp.float32)
    k_stop, T, out5 = jax.lax.while_loop(cond, body, (k0, T0, o0))

    # final per-pixel T as a (1, P) row: identity-matmul transpose
    t_row = _transpose_col_to_row(T)

    o_ref[0, 0:5, :] = out5
    o_ref[0, 5:6, :] = t_row
    o_ref[0, 6:7, :] = jnp.full((1, P), k_stop.astype(jnp.float32))
    o_ref[0, 7:8, :] = jnp.zeros((1, P), jnp.float32)


def _transpose_col_to_row(col):
    """(P, 1) -> (1, P) without a vector transpose: identity matmul."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (ii == jj).astype(jnp.float32)
    return jax.lax.dot_general(
        jnp.ones((1, P), jnp.float32), eye * col,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _transpose_row_to_col(row):
    """(1, P) -> (P, 1): identity matmul the other way."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    eye = (ii == jj).astype(jnp.float32)
    return jax.lax.dot_general(
        eye * row, jnp.ones((1, P), jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _shift_left_fill0(x, s, lane_iota):
    """x[:, j] <- x[:, j+s], lanes j >= D-s filled with 0.
    (pltpu.roll only accepts non-negative shifts: left-by-s == right-by-D-s.)
    """
    rolled = pltpu.roll(x, D - s, axis=1)
    return jnp.where(lane_iota >= D - s, 0.0, rolled)


def _recompute_alpha(ch, px, py):
    """Shared fwd/bwd per-chunk alpha math.  ch: (ATTR, D) attr rows."""
    mx = ch[0:1, :]
    my = ch[1:2, :]
    ca = ch[2:3, :]
    cb = ch[3:4, :]
    cc = ch[4:5, :]
    op = ch[8:9, :]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    epower = jnp.exp(power)
    a_raw = op * epower
    a_min = jnp.minimum(_ALPHA_MAX, a_raw)
    cond = (power <= 0.0) & (a_min >= _ALPHA_MIN)
    alpha = jnp.where(cond, a_min, 0.0)
    return alpha, a_raw, cond, epower, dx, dy


def _bwd_kernel(kstop_ref, cells_ref, xy_ref, first_ref, slab_ref, g_ref,
                ts_ref, do_ref):
    """Per-tile backward: a SINGLE reverse sweep over the chunks the forward
    actually composited (k_stop from the forward), reading the forward's
    checkpointed per-chunk starting-transmittance rows, with the CUDA-style
    suffix accumulator S_i = sum_{j>i} w_j (g.b_j)
    (diff-gaussian-rasterization backward.cu renderCUDA semantics, with the
    live/clamp masking matching gs/render._composite_xla's autodiff exactly).
    Gradients accumulate into the per-CELL dslab block across the cell's
    tiles (grid is cell-major; the block stays resident between revisits)."""
    i = pl.program_id(0)
    x0 = xy_ref[i, 0].astype(jnp.float32)
    y0 = xy_ref[i, 1].astype(jnp.float32)
    k_stop = kstop_ref[i]

    @pl.when(first_ref[i] == 1)
    def _():
        do_ref[...] = jnp.zeros_like(do_ref)

    pix_lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pix_lin % TILE).astype(jnp.float32) + x0
    py = (pix_lin // TILE).astype(jnp.float32) + y0
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (P, D), 1)

    # cotangent rows: [g_r, g_g, g_b, g_acc, g_dep] (5, P)
    g5 = g_ref[0, 0:5, :]

    # reverse sweep over composited chunks with suffix accumulator S (P, 1)
    def p2_body(kk, S):
        k = k_stop - 1 - kk
        ch = slab_ref[0, :, pl.ds(k * D, D)]
        alpha, a_raw, cond, epower, dx, dy = _recompute_alpha(ch, px, py)
        om = 1.0 - alpha
        y = _shift_right_fill(om, 1, 1.0, lane_iota)
        s = 1
        while s < D:
            y = y * _shift_right_fill(y, s, 1.0, lane_iota)
            s *= 2
        T_start = _transpose_row_to_col(ts_ref[0, pl.ds(k, 1), :])
        T_excl = T_start * y
        live = T_excl >= _T_EPS
        w = jnp.where(live, alpha * T_excl, 0.0)            # (P, D)

        b5 = jnp.concatenate(
            [ch[5:8, :], jnp.ones((1, D), jnp.float32), ch[9:10, :]], axis=0)
        gdotb = jax.lax.dot_general(
            g5, b5, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (P, D)

        wg = w * gdotb
        # within-chunk exclusive suffix sum along lanes
        z = _shift_left_fill0(wg, 1, lane_iota)
        s = 1
        while s < D:
            z = z + _shift_left_fill0(z, s, lane_iota)
            s *= 2
        S_i = S + z                                          # (P, D)

        dalpha = jnp.where(live, T_excl * gdotb, 0.0) - S_i / om
        # through alpha = where(cond, min(0.99, a_raw), 0)
        da_raw = jnp.where(cond & (a_raw < _ALPHA_MAX), dalpha, 0.0)
        dpower = a_raw * da_raw
        dop_pd = da_raw * epower
        ca = ch[2:3, :]
        cb = ch[3:4, :]
        cc = ch[4:5, :]
        ddx = dpower * (-(ca * dx + cb * dy))
        ddy = dpower * (-(cc * dy + cb * dx))

        ones_row = jnp.ones((1, P), jnp.float32)

        def reduce_p(x):                                     # (P, D) -> (1, D)
            return jax.lax.dot_general(
                ones_row, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dmx = -reduce_p(ddx)
        dmy = -reduce_p(ddy)
        dca = reduce_p(-0.5 * dx * dx * dpower)
        dcb = reduce_p(-dx * dy * dpower)
        dcc = reduce_p(-0.5 * dy * dy * dpower)
        dop = reduce_p(dop_pd)
        dcol = jax.lax.dot_general(
            g5[0:3, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (3, D)
        ddpt = jax.lax.dot_general(
            g5[4:5, :], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (1, D)

        dchunk = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dcol, dop, ddpt,
             jnp.zeros((ATTR - 10, D), jnp.float32)], axis=0)  # (ATTR, D)
        do_ref[0, :, pl.ds(k * D, D)] += dchunk

        S = S + jnp.sum(wg, axis=1, keepdims=True)
        return S

    jax.lax.fori_loop(0, k_stop, p2_body, jnp.zeros((P, 1), jnp.float32))


def composite_tiles_bwd(slab: jnp.ndarray, g_out: jnp.ndarray,
                        ts: jnp.ndarray, k_stop: jnp.ndarray,
                        cell_of_tile: np.ndarray, tile_xy: np.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """VJP of composite_tiles_fwd w.r.t. the slab.

    slab: (n_cells, ATTR, Kc); g_out: (n_tiles, 8, P) cotangents (rows 0-4
    = [r,g,b,acc,depth], rows 5-7 ignored); ts: (n_tiles, n_chunks, P) the
    forward's checkpointed chunk-start transmittance rows; k_stop:
    (n_tiles,) i32 chunks the forward composited.  Returns dslab with the
    same shape as slab.
    """
    n_cells, attr, kc = slab.shape
    assert attr == ATTR and kc % D == 0
    n_tiles = cell_of_tile.shape[0]
    n_chunks = kc // D

    perm = np.argsort(cell_of_tile, kind="stable").astype(np.int32)
    cells_sorted = cell_of_tile[perm].astype(np.int32)
    xy_sorted = tile_xy[perm].astype(np.int32)
    first = np.zeros(n_tiles, np.int32)
    first[np.unique(cells_sorted, return_index=True)[1]] = 1

    perm_j = jnp.asarray(perm)
    g_sorted = g_out[perm_j]
    ts_sorted = ts[perm_j]
    kstop_sorted = k_stop[perm_j].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, ATTR, kc),
                         lambda i, ks, cells, xy, first: (cells[i], 0, 0)),
            pl.BlockSpec((1, 8, P),
                         lambda i, ks, cells, xy, first: (i, 0, 0)),
            pl.BlockSpec((1, n_chunks, P),
                         lambda i, ks, cells, xy, first: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ATTR, kc),
                               lambda i, ks, cells, xy, first: (cells[i], 0, 0)),
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_cells, ATTR, kc), jnp.float32),
        interpret=interpret,
    )(kstop_sorted, jnp.asarray(cells_sorted), jnp.asarray(xy_sorted),
      jnp.asarray(first), slab, g_sorted, ts_sorted)


def composite_tiles_fwd(slab: jnp.ndarray, cell_of_tile: np.ndarray,
                        tile_xy: np.ndarray,
                        live_count: Optional[jnp.ndarray] = None,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """slab: (n_cells, ATTR, Kc) attr-major depth-sorted per-cell gaussians
    (dead/padding entries must have opacity 0 and sort LAST).  cell_of_tile /
    tile_xy are STATIC numpy arrays (the tile raster layout); ``live_count``
    is an optional traced (n_cells,) i32 of live slab entries per cell — the
    kernel skips the all-DEAD padding chunks beyond it (exact: dead entries
    have alpha 0 and change nothing).  Returns

    - out (n_tiles, 8, P): rows [r, g, b, acc, depth, T_final, k_stop, 0];
    - ts (n_tiles, n_chunks, P): per-chunk starting transmittance rows
      (the backward's checkpoints; rows >= k_stop are uninitialized).
    """
    n_cells, attr, kc = slab.shape
    assert attr == ATTR and kc % D == 0
    n_tiles = cell_of_tile.shape[0]
    n_chunks = kc // D

    # cell-major tile order so consecutive grid steps reuse the slab block
    perm = np.argsort(cell_of_tile, kind="stable").astype(np.int32)
    cells_sorted = cell_of_tile[perm].astype(np.int32)
    xy_sorted = tile_xy[perm].astype(np.int32)

    if live_count is None:
        cnt_tile = jnp.full((n_tiles,), n_chunks, jnp.int32)
    else:
        cnt_chunks = (live_count.astype(jnp.int32) + (D - 1)) // D
        cnt_tile = cnt_chunks[jnp.asarray(cells_sorted)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, ATTR, kc),
                         lambda i, cnt, cells, xy: (cells[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, P),
                         lambda i, cnt, cells, xy: (i, 0, 0)),
            pl.BlockSpec((1, n_chunks, P),
                         lambda i, cnt, cells, xy: (i, 0, 0)),
        ],
    )
    out, ts = pl.pallas_call(
        functools.partial(_fwd_kernel, n_chunks=n_chunks),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, P), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, n_chunks, P), jnp.float32)],
        interpret=interpret,
    )(cnt_tile, jnp.asarray(cells_sorted), jnp.asarray(xy_sorted), slab)
    # undo the cell-major permutation
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n_tiles, dtype=np.int32)
    inv_j = jnp.asarray(inv)
    return out[inv_j], ts[inv_j]
