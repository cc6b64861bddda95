"""Differentiable 3D Gaussian Splatting renderer, TPU-native.

Replaces the CUDA ``diff-gaussian-rasterization`` submodule
(recon/gaussian_renderer/__init__.py:22-134).  Design for TPU/XLA:

- EWA projection (means -> screen, 3D cov -> 2D conic) is dense vectorized
  math over all N gaussians.
- Rasterization is tile-based like the CUDA kernel (16x16 tiles).  A coarse
  binning stage preselects the Kc depth-nearest overlapping gaussians per
  coarse cell (static-shape recast of the CUDA duplicate-and-sort binning);
  each fine tile then STREAMS the whole depth-sorted slab through a
  running-transmittance compositor (``lax.scan`` over fixed depth chunks,
  flash-attention style) — no per-tile top-K truncation.  Round 2 used a
  fixed top-K slab per tile; measured object-centric fits put 2000+
  gaussians on p95 tiles, so any affordable K starved most gaussians of
  gradient and the fit stalled at 16.5 dB.  All static shapes, fully
  differentiable by JAX autodiff (the CUDA backward kernel comes for free).
- Tiles are processed in chunks under ``lax.map`` with rematerialization to
  bound working memory.

Matches the CUDA semantics: 0.3 px low-pass on the 2D cov, 1/255 alpha
cutoff, 0.99 alpha clamp, T < 1e-4 termination, SH color ``max(sh+0.5, 0)``,
near-plane z > 0.2.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v3d_tpu.gs.gaussians import (
    GaussianParams,
    get_features,
    get_opacity,
)
from v3d_tpu.gs.sh import eval_sh

TILE = 16


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray   # (N, 2) pixel coords
    conic: jnp.ndarray     # (N, 3) upper-triangular inverse 2D cov (a, b, c)
    depth: jnp.ndarray     # (N,) view-space z
    radius: jnp.ndarray    # (N,) screen-space 3-sigma radius (pixels)
    color: jnp.ndarray     # (N, 3)
    opacity: jnp.ndarray   # (N,)
    valid: jnp.ndarray     # (N,) bool


def project_gaussians(g: GaussianParams, cam, active_sh_degree: int = 0,
                      scaling_modifier: float = 1.0) -> ProjectedGaussians:
    """EWA splatting projection (CUDA preprocess step)."""
    W = cam.width
    H = cam.height
    tan_fovx = float(np.tan(cam.fovx * 0.5))
    tan_fovy = float(np.tan(cam.fovy * 0.5))
    fx = W / (2.0 * tan_fovx)
    fy = H / (2.0 * tan_fovy)

    wvt = jnp.asarray(cam.world_view_transform)   # (4,4), row-vector layout
    fpt = jnp.asarray(cam.full_proj_transform)
    campos = jnp.asarray(cam.camera_center)

    xyz = g.xyz
    # f32 precision is load-bearing: TPU matmuls default to bf16 precision
    # (~0.4% rel err), which jitters means2d by ~1 px at 512^2 — gaussians
    # then cannot localize below that and fits stall in the low teens dB
    # (observed: 128^2 fits fine at the same relative error = 0.25 px).
    # The (N,4)x(4,4) transforms are written as broadcast FMAs rather than
    # dot_general: the MXU pads a 4-wide contraction to full tiles and a
    # HIGHEST-precision pass costs 6x more — measured 43.5 ms of projection
    # at N=300k, almost all of it these paddings (VPU form: elementwise).
    def affine4(m):
        return (xyz[:, 0:1] * m[0][None] + xyz[:, 1:2] * m[1][None]
                + xyz[:, 2:3] * m[2][None] + m[3][None])

    p_view = affine4(wvt)    # (N, 4)
    p_clip = affine4(fpt)
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)
    ndc = p_clip[:, :3] * p_w[:, None]
    means2d = jnp.stack([
        ((ndc[:, 0] + 1.0) * W - 1.0) * 0.5,
        ((ndc[:, 1] + 1.0) * H - 1.0) * 0.5,
    ], axis=-1)

    tz = p_view[:, 2]
    in_front = tz > 0.2

    # EWA: cov2D = J R Sigma R^T J^T + 0.3 I
    safe_tz = jnp.where(in_front, tz, 1.0)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(p_view[:, 0] / safe_tz, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / safe_tz, -limy, limy)
    tx = txtz * safe_tz
    ty = tytz * safe_tz

    # cov2d = M Sigma M^T with Sigma = L L^T (L = R diag(s)); computed as
    # A = M L then the three unique entries of A A^T.  All broadcast FMAs
    # over (N,3) vectors — the batched (N,2,3)@(N,3,3) dot_generals this
    # replaces padded the 3-wide contractions onto MXU tiles at HIGHEST
    # precision and dominated the projection profile.
    from v3d_tpu.gs.gaussians import build_rotation, get_scaling

    R_w2c = wvt[:3, :3].T                      # (3,3) — rows are constants
    L = (build_rotation(g.rotation)
         * (get_scaling(g) * scaling_modifier)[:, None, :])  # (N, 3, 3)
    a0 = fx / safe_tz
    c0 = -fx * tx / safe_tz**2
    a1 = fy / safe_tz
    c1 = -fy * ty / safe_tz**2
    m0 = a0[:, None] * R_w2c[0][None] + c0[:, None] * R_w2c[2][None]  # (N,3)
    m1 = a1[:, None] * R_w2c[1][None] + c1[:, None] * R_w2c[2][None]
    A0 = (m0[:, 0:1] * L[:, 0, :] + m0[:, 1:2] * L[:, 1, :]
          + m0[:, 2:3] * L[:, 2, :])           # (N, 3)
    A1 = (m1[:, 0:1] * L[:, 0, :] + m1[:, 1:2] * L[:, 1, :]
          + m1[:, 2:3] * L[:, 2, :])
    c00 = jnp.sum(A0 * A0, axis=-1) + 0.3
    c01 = jnp.sum(A0 * A1, axis=-1)
    c11 = jnp.sum(A1 * A1, axis=-1) + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det > 0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # SH -> RGB with view direction from camera to point (CUDA adds 0.5 and
    # clamps negatives)
    dirs = xyz - campos[None]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    color = eval_sh(active_sh_degree, get_features(g), dirs)
    color = jnp.maximum(color + 0.5, 0.0)

    opacity = get_opacity(g)[:, 0]
    valid = in_front & det_ok & g.alive & (radius > 0)
    return ProjectedGaussians(means2d, conic, tz, radius, color, opacity, valid)


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    max_per_tile: int = 256       # depth-chunk size D of the streaming
    #                               compositor (NOT a truncation limit: every
    #                               coarse-slab gaussian is composited)
    tile_chunk: int = 32          # fine tiles processed per lax.map step
    coarse_factor: int = 8        # coarse cell = coarse_factor^2 fine tiles
    max_per_coarse: int = 4096    # Kc: gaussians preselected per coarse cell
    force_coarse: bool = False    # exercise the coarse path even when N <= Kc
    # compositor backend: "auto" picks the fused Pallas tile kernel on TPU
    # (early-exit while_loop; see gs/pallas_raster.py) and the XLA lax.scan
    # path elsewhere; "xla"/"pallas" force one.
    backend: str = "auto"
    pallas_interpret: bool = False   # run the Pallas kernel interpreted (CPU tests)
    pallas_bwd: str = "pallas"       # "pallas" reverse kernel | "xla" recompute


class RenderOutput(NamedTuple):
    image: jnp.ndarray   # (H, W, 3)
    alpha: jnp.ndarray   # (H, W)
    depth: jnp.ndarray   # (H, W)
    radii: jnp.ndarray   # (N,)


def _composite_xla(slab_all: jnp.ndarray, cell_np: np.ndarray,
                   xy_np: np.ndarray, D: int, tile_chunk: int):
    """XLA streaming compositor: lax.scan over fixed-size depth chunks with
    a running per-pixel transmittance — every slab gaussian is composited,
    none truncated.  Chunk size D bounds the working set (C*P*D).

    slab_all: (n_cells, K, 10) depth-sorted packed attrs (DEAD-padded).
    cell_np/xy_np: static tile->cell map and tile origins.
    Returns (rgb (n_tiles, P, 3), acc (n_tiles, P), dep (n_tiles, P)) — raw,
    background NOT blended.
    """
    n_cells, Kq, _ = slab_all.shape
    n_tiles = cell_np.shape[0]
    P = TILE * TILE
    DEAD = jnp.zeros((10,), jnp.float32)
    pad_k = (-Kq) % D
    if pad_k:
        slab_all = jnp.concatenate([
            slab_all,
            jnp.broadcast_to(DEAD, (n_cells, pad_k, 10))], axis=1)
    n_d = (Kq + pad_k) // D

    cell_j = jnp.asarray(cell_np)
    xy_j = jnp.asarray(xy_np, jnp.float32)

    # pixel coordinates within a tile (TILE*TILE, 2) as (x, y)
    py, px = jnp.mgrid[0:TILE, 0:TILE]
    tile_pix = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1).astype(jnp.float32)

    def render_tiles(ids):
        # ids: (C,) tile indices
        C = ids.shape[0]
        if n_cells > 1:
            slab = slab_all[cell_j[ids]]               # (C, Kq+pad, 10)
        else:
            slab = slab_all                            # (1, Kq+pad, 10)
        chunks = slab.reshape(slab.shape[0], n_d, D, 10).transpose(1, 0, 2, 3)

        # pixel centers of this tile chunk: (C, P, 2)
        pix = tile_pix[None] + xy_j[ids][:, None, :]

        # checkpoint: without it the scan backward stores (C, P, D) residuals
        # for every depth chunk (~1.5GB at 512^2 / Kc=16384); with it only
        # the (C, P) carries persist and alpha recomputes in backward
        @jax.checkpoint
        def body(carry, ch):
            # ch: (C or 1, D, 10) — broadcasting handles the shared-slab case
            T, rgb, acc, dep = carry
            m2 = ch[..., 0:2]
            con = ch[..., 2:5]
            col = ch[..., 5:8]
            op = ch[..., 8]
            dpt = ch[..., 9]
            d = pix[:, :, None, :] - m2[:, None, :, :]      # (C, P, D, 2)
            dx, dy = d[..., 0], d[..., 1]
            power = (-0.5 * (con[:, None, :, 0] * dx * dx
                             + con[:, None, :, 2] * dy * dy)
                     - con[:, None, :, 1] * dx * dy)        # (C, P, D)
            alpha = jnp.minimum(0.99, op[:, None, :] * jnp.exp(power))
            alpha = jnp.where((power <= 0) & (alpha >= 1.0 / 255.0), alpha, 0.0)

            one_minus = 1.0 - alpha
            T_local = jnp.cumprod(one_minus, axis=-1)
            T_excl = T[..., None] * jnp.concatenate(
                [jnp.ones_like(T_local[..., :1]), T_local[..., :-1]], axis=-1)
            live = T_excl >= 1e-4                           # CUDA stop criterion
            w = alpha * T_excl * live                       # (C, P, D)

            hp = jax.lax.Precision.HIGHEST
            rgb = rgb + jnp.einsum("cpk,ckj->cpj", w, jnp.broadcast_to(
                col, (C,) + col.shape[1:]), precision=hp)
            acc = acc + jnp.sum(w, axis=-1)
            dep = dep + jnp.einsum("cpk,ck->cp", w, jnp.broadcast_to(
                dpt, (C,) + dpt.shape[1:]), precision=hp)
            T = T * T_local[..., -1]
            return (T, rgb, acc, dep), None

        init = (jnp.ones((C, P)), jnp.zeros((C, P, 3)), jnp.zeros((C, P)),
                jnp.zeros((C, P)))
        (T, rgb, acc, dep), _ = jax.lax.scan(body, init, chunks)
        return rgb, acc, dep

    render_tiles = jax.checkpoint(render_tiles)

    C = tile_chunk
    pad = (-n_tiles) % C
    tile_ids = jnp.arange(n_tiles)
    ids = jnp.concatenate([tile_ids, jnp.zeros((pad,), tile_ids.dtype)])
    ids = ids.reshape(-1, C)
    rgb, acc, dep = jax.lax.map(render_tiles, ids)
    # (n_chunks, C, P, ...) -> (n_tiles, P, ...)
    rgb = rgb.reshape(-1, P, 3)[:n_tiles]
    acc = acc.reshape(-1, P)[:n_tiles]
    dep = dep.reshape(-1, P)[:n_tiles]
    return rgb, acc, dep


@functools.lru_cache(maxsize=64)
def _make_pallas_composite(cell_bytes: bytes, xy_bytes: bytes, n_tiles: int,
                           n_cells: int, Kq: int, D: int, tile_chunk: int,
                           interpret: bool, bwd: str = "pallas"):
    """Build the custom-VJP Pallas compositor for a fixed tile layout.

    Forward: the fused early-exit tile kernel (gs/pallas_raster.py).
    Backward: the matching Pallas reverse-traversal kernel (default), or
    ``bwd="xla"`` to recompute through the XLA streaming compositor
    (identical math, autodiff'd) — the flash-attention convention
    (ops/flash_attention.py:98-113) kept as a debug/AB path.
    """
    cell_np = np.frombuffer(cell_bytes, np.int32).copy()
    xy_np = np.frombuffer(xy_bytes, np.int32).reshape(n_tiles, 2).copy()

    from v3d_tpu.gs.pallas_raster import ATTR, P
    from v3d_tpu.gs.pallas_raster import D as PD
    from v3d_tpu.gs.pallas_raster import (composite_tiles_bwd,
                                          composite_tiles_fwd)

    kpad = (-Kq) % PD

    def _to_attr_major(slab):
        if kpad:
            slab = jnp.concatenate([
                slab, jnp.zeros((n_cells, kpad, 10), jnp.float32)], axis=1)
        slab_am = jnp.transpose(slab, (0, 2, 1))            # (cells, 10, K)
        return jnp.pad(slab_am, ((0, 0), (0, ATTR - 10), (0, 0)))

    def _pallas_fwd(slab, live_count):
        out, ts = composite_tiles_fwd(_to_attr_major(slab), cell_np, xy_np,
                                      live_count=live_count,
                                      interpret=interpret)
        rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))       # (n_tiles, P, 3)
        k_stop = out[:, 6, 0].astype(jnp.int32)
        return (rgb, out[:, 3, :], out[:, 4, :]), ts, k_stop

    @jax.custom_vjp
    def comp(slab, live_count):
        return _pallas_fwd(slab, live_count)[0]

    def fwd_rule(slab, live_count):
        primal, ts, k_stop = _pallas_fwd(slab, live_count)
        if bwd == "pallas":
            return primal, (slab, ts, k_stop)
        return primal, slab

    def bwd_rule_xla(slab, g):
        _, vjp = jax.vjp(
            lambda s: _composite_xla(s, cell_np, xy_np, D, tile_chunk), slab)
        return vjp(g) + (None,)

    def bwd_rule_pallas(res, g):
        slab, ts, k_stop = res
        g_rgb, g_acc, g_dep = g
        g8 = jnp.concatenate([
            jnp.transpose(g_rgb, (0, 2, 1)),
            g_acc[:, None, :], g_dep[:, None, :],
            jnp.zeros((n_tiles, 3, P), jnp.float32)], axis=1)
        dslab_am = composite_tiles_bwd(_to_attr_major(slab), g8, ts, k_stop,
                                       cell_np, xy_np, interpret=interpret)
        dslab = jnp.transpose(dslab_am[:, :10, :], (0, 2, 1))[:, :Kq]
        return (dslab, None)

    comp.defvjp(fwd_rule,
                bwd_rule_pallas if bwd == "pallas" else bwd_rule_xla)
    return comp


def _build_slabs(proj: ProjectedGaussians, height: int, width: int,
                 config: RasterizeConfig,
                 screen_offset: Optional[jnp.ndarray] = None):
    """Binning stage shared by the single-device and tile-sharded paths:
    pack per-gaussian attributes and preselect the depth-sorted slab per
    coarse cell.  Returns (slab_all, live_count, cell_np, xy_np, layout)
    where layout = (n_tx, n_ty, n_tiles, Kq)."""
    means2d = proj.means2d
    if screen_offset is not None:
        means2d = means2d + screen_offset

    N = means2d.shape[0]
    n_tx = -(-width // TILE)
    n_ty = -(-height // TILE)
    n_tiles = n_tx * n_ty

    depth_masked = jnp.where(proj.valid, proj.depth, jnp.inf)
    # invalid gaussians (behind camera / degenerate cov / dead slot) must be
    # inert in the streaming compositor: zero opacity is enough
    op_eff = jnp.where(proj.valid, proj.opacity, 0.0)

    # pack all per-gaussian attributes so every selection stage is a SINGLE
    # row gather (TPU gathers cost ~100ns/row; 6 separate field gathers were
    # the profile hotspot): [m2(2) | conic(3) | color(3) | op | depth]
    packed = jnp.concatenate([
        means2d, proj.conic, proj.color, op_eff[:, None],
        proj.depth[:, None]], axis=1)                      # (N, 10)
    DEAD = jnp.asarray([0, 0, 0, 0, 0, 0, 0, 0, 0, 0], jnp.float32)

    gx_all = means2d[:, 0]
    gy_all = means2d[:, 1]
    r_all = proj.radius

    # ---- coarse binning: group fine tiles into coarse cells and preselect
    # the Kc depth-nearest overlapping gaussians per cell (the CUDA
    # rasterizer's duplicate-and-sort binning recast as a masked top_k).
    cf = config.coarse_factor
    Kc = min(config.max_per_coarse, N)
    use_coarse = cf > 1 and (N > Kc or config.force_coarse)
    if use_coarse:
        n_cx = -(-n_tx // cf)
        n_cy = -(-n_ty // cf)
        ctile = TILE * cf
        cxs = (jnp.arange(n_cx * n_cy) % n_cx).astype(jnp.float32) * ctile
        cys = (jnp.arange(n_cx * n_cy) // n_cx).astype(jnp.float32) * ctile
        c_overlap = ((gx_all[None] + r_all[None] >= cxs[:, None])
                     & (gx_all[None] - r_all[None] <= cxs[:, None] + ctile)
                     & (gy_all[None] + r_all[None] >= cys[:, None])
                     & (gy_all[None] - r_all[None] <= cys[:, None] + ctile))
        c_score = jnp.where(c_overlap, depth_masked[None], jnp.inf)
        c_neg, coarse_idx = jax.lax.top_k(-c_score, Kc)  # (n_coarse, Kc)
        coarse_ok = jnp.isfinite(c_neg)                  # sorted near -> far
        slab_all = packed[coarse_idx]                    # (n_coarse, Kc, 10)
        slab_all = jnp.where(coarse_ok[..., None], slab_all,
                             DEAD[None, None, :])
        # live entries per cell: DEAD padding sorts last, so the fused
        # kernel can skip whole all-DEAD depth chunks (exact — alpha 0)
        live_count = jnp.sum(coarse_ok, axis=1).astype(jnp.int32)
        Kq = Kc
    else:
        # small scene: one global near->far sort shared by every tile
        order = jnp.argsort(depth_masked)
        slab_all = packed[order][None]                   # (1, N, 10)
        live_count = jnp.sum(jnp.isfinite(depth_masked))[None].astype(jnp.int32)
        Kq = N

    # static tile raster layout (numpy — baked into the compiled program)
    tx_np = np.arange(n_tiles) % n_tx
    ty_np = np.arange(n_tiles) // n_tx
    if use_coarse:
        cell_np = ((ty_np // cf) * n_cx + tx_np // cf).astype(np.int32)
    else:
        cell_np = np.zeros(n_tiles, np.int32)
    xy_np = np.stack([tx_np * TILE, ty_np * TILE], -1).astype(np.int32)
    return slab_all, live_count, cell_np, xy_np, (n_tx, n_ty, n_tiles, Kq)


def _untile(x: jnp.ndarray, n_tx: int, n_ty: int, height: int, width: int):
    c = x.shape[-1] if x.ndim == 3 else 1
    x = x.reshape(n_ty, n_tx, TILE, TILE, c)
    x = x.transpose(0, 2, 1, 3, 4).reshape(n_ty * TILE, n_tx * TILE, c)
    return x[:height, :width]


def rasterize(proj: ProjectedGaussians, height: int, width: int,
              background: jnp.ndarray,
              config: RasterizeConfig = RasterizeConfig(),
              screen_offset: Optional[jnp.ndarray] = None) -> RenderOutput:
    """Tile-based alpha compositing.  ``screen_offset`` is the reference's
    screenspace-points trick (gaussian_renderer/__init__.py:37-46): a zeros
    (N, 2) array added to means2d whose gradient gives the densification
    statistic."""
    slab_all, live_count, cell_np, xy_np, (n_tx, n_ty, n_tiles, Kq) = \
        _build_slabs(proj, height, width, config, screen_offset)

    backend = config.backend
    if backend == "auto":
        backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
                   else "xla")
    D = max(1, min(config.max_per_tile, Kq))
    if backend == "pallas":
        comp = _make_pallas_composite(
            cell_np.tobytes(), xy_np.tobytes(), n_tiles,
            slab_all.shape[0], slab_all.shape[1], D, config.tile_chunk,
            config.pallas_interpret, config.pallas_bwd)
        rgb, acc, dep = comp(slab_all, live_count)
    else:
        rgb, acc, dep = _composite_xla(slab_all, cell_np, xy_np, D,
                                       config.tile_chunk)
    # telescoping: sum_i alpha_i T_i + T_final == 1 (also under the stop
    # mask), so the background weight is exactly 1 - acc
    rgb = rgb + (1.0 - acc)[..., None] * background[None, None, :]

    image = _untile(rgb, n_tx, n_ty, height, width)
    alpha = _untile(acc, n_tx, n_ty, height, width)[..., 0]
    depth = _untile(dep, n_tx, n_ty, height, width)[..., 0]
    radii = jnp.where(proj.valid, proj.radius, 0.0)
    return RenderOutput(image, alpha, depth, radii)


def rasterize_sharded(proj: ProjectedGaussians, height: int, width: int,
                      background: jnp.ndarray, mesh, axis: str,
                      config: RasterizeConfig = RasterizeConfig(),
                      screen_offset: Optional[jnp.ndarray] = None
                      ) -> RenderOutput:
    """Tile-sharded rasterization for multi-chip fits: the binning stage is
    replicated (cheap, O(N) vector math), the per-tile streaming compositor
    is sharded over the mesh ``axis`` (each device composites its strip of
    the 16x16 tile grid against the full slab).  The backward psums slab
    cotangents across shards automatically (shard_map replicated-input
    rule), which IS the gradient all-reduce of a tile-parallel fit.

    Reference analog: none — the CUDA rasterizer is single-GPU; this is the
    TPU-native scale-out of recon/gaussian_renderer/__init__.py:22-134.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    slab_all, live_count, cell_np, xy_np, (n_tx, n_ty, n_tiles, Kq) = \
        _build_slabs(proj, height, width, config, screen_offset)

    nsh = mesh.shape[axis]
    pad = (-n_tiles) % nsh
    cell = jnp.asarray(np.concatenate([cell_np, np.zeros(pad, np.int32)]))
    xy = jnp.asarray(np.concatenate(
        [xy_np, np.zeros((pad, 2), np.int32)]).astype(np.int32))
    D = max(1, min(config.max_per_tile, Kq))

    def shard_fn(slab, cell_s, xy_s):
        # _composite_xla takes the tile layout as arrays: per-shard slices
        return _composite_xla(slab, cell_s, xy_s, D, config.tile_chunk)

    # check_vma off: the scan carry inits inside _composite_xla are
    # unvarying constants that become data-varying through the body, which
    # the static VMA checker can't express; grads still psum correctly via
    # the in_specs (replicated slab -> cotangent all-reduce).
    rgb, acc, dep = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False)(slab_all, cell, xy)
    rgb = rgb[:n_tiles]
    acc = acc[:n_tiles]
    dep = dep[:n_tiles]
    rgb = rgb + (1.0 - acc)[..., None] * background[None, None, :]

    image = _untile(rgb, n_tx, n_ty, height, width)
    alpha = _untile(acc, n_tx, n_ty, height, width)[..., 0]
    depth = _untile(dep, n_tx, n_ty, height, width)[..., 0]
    radii = jnp.where(proj.valid, proj.radius, 0.0)
    return RenderOutput(image, alpha, depth, radii)


def render(g: GaussianParams, cam, background: jnp.ndarray,
           active_sh_degree: int = 0, scaling_modifier: float = 1.0,
           config: RasterizeConfig = RasterizeConfig(),
           screen_offset: Optional[jnp.ndarray] = None) -> RenderOutput:
    """Full render (counterpart of recon/gaussian_renderer/__init__.py:22)."""
    proj = project_gaussians(g, cam, active_sh_degree, scaling_modifier)
    return rasterize(proj, cam.height, cam.width, background, config,
                     screen_offset=screen_offset)
