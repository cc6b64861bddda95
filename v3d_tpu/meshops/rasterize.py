"""Differentiable triangle rasterizer (nvdiffrast replacement for
mesh_recon/refine.py:42,135-178).

TPU design mirrors the 3DGS tile rasterizer: 16x16 pixel tiles each gather a
fixed top-K slab of depth-sorted candidate triangles (screen-bbox overlap
test), then evaluate edge functions + barycentrics per pixel and z-select the
nearest covering triangle.  Static shapes, differentiable w.r.t. vertex
attributes through the barycentric interpolation.

Antialiased edge gradients (dr.antialias analog, used on alpha AND color in
mesh_recon/refine.py:115-168): each candidate triangle contributes a soft
coverage clamp(d + 1/2, 0, 1), where d is the signed screen-space distance
(pixels) from the pixel center to the triangle boundary — positive inside.
``alpha`` = clip(sum over candidates) so interior shared edges sum to 1
(no seams) while silhouette pixels get partial coverage that is
DIFFERENTIABLE W.R.T. VERTEX POSITIONS; uncovered pixels within half a
pixel of a silhouette take the nearest triangle's clamped-barycentric
attributes so color also feathers across the edge like dr.antialias.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16


class RasterOut(NamedTuple):
    attr: jnp.ndarray    # (H, W, C) interpolated attributes
    mask: jnp.ndarray    # (H, W) hard coverage
    depth: jnp.ndarray   # (H, W)
    bary: jnp.ndarray    # (H, W, 3)
    alpha: jnp.ndarray   # (H, W) antialiased coverage (vertex-position grads)


@dataclasses.dataclass(frozen=True)
class MeshRasterizer:
    height: int
    width: int
    max_per_tile: int = 256
    tile_chunk: int = 16

    def __call__(self, verts_clip: jnp.ndarray, faces: jnp.ndarray,
                 attrs: jnp.ndarray) -> RasterOut:
        """verts_clip: (V, 4) clip-space positions; faces (F, 3) int32;
        attrs (V, C) per-vertex attributes."""
        H, W = self.height, self.width
        w_clip = verts_clip[:, 3:4]
        ndc = verts_clip[:, :3] / jnp.where(jnp.abs(w_clip) < 1e-9, 1e-9, w_clip)
        # OpenGL-style viewport: x right, y up -> flip y for row-major image
        sx = (ndc[:, 0] * 0.5 + 0.5) * W - 0.5
        sy = (-ndc[:, 1] * 0.5 + 0.5) * H - 0.5
        sz = ndc[:, 2]
        visible_v = w_clip[:, 0] > 1e-6

        v0, v1, v2 = faces[:, 0], faces[:, 1], faces[:, 2]
        x0, y0 = sx[v0], sy[v0]
        x1, y1 = sx[v1], sy[v1]
        x2, y2 = sx[v2], sy[v2]
        z0, z1, z2 = sz[v0], sz[v1], sz[v2]
        f_ok = visible_v[v0] & visible_v[v1] & visible_v[v2]
        zmin = jnp.minimum(jnp.minimum(z0, z1), z2)
        xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
        xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
        ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
        ymax = jnp.maximum(jnp.maximum(y0, y1), y2)

        K = min(self.max_per_tile, faces.shape[0])
        n_tx = -(-W // TILE)
        n_ty = -(-H // TILE)
        n_tiles = n_tx * n_ty
        depth_masked = jnp.where(f_ok, zmin, jnp.inf)

        py, px = jnp.mgrid[0:TILE, 0:TILE]
        tile_pix = jnp.stack([px.reshape(-1), py.reshape(-1)], -1).astype(jnp.float32)

        a0 = attrs[v0]
        a1 = attrs[v1]
        a2 = attrs[v2]

        def render_tiles(ids):
            tx = (ids % n_tx).astype(jnp.float32) * TILE
            ty = (ids // n_tx).astype(jnp.float32) * TILE
            overlap = ((xmax[None] >= tx[:, None]) & (xmin[None] <= tx[:, None] + TILE)
                       & (ymax[None] >= ty[:, None]) & (ymin[None] <= ty[:, None] + TILE))
            score = jnp.where(overlap, depth_masked[None], jnp.inf)
            neg, idx = jax.lax.top_k(-score, K)
            ok = jnp.isfinite(neg)                                  # (C, K)

            pix = tile_pix[None] + jnp.stack([tx, ty], -1)[:, None, :]  # (C,P,2)
            pxx = pix[:, :, None, 0]
            pyy = pix[:, :, None, 1]
            X0, Y0 = x0[idx][:, None], y0[idx][:, None]
            X1, Y1 = x1[idx][:, None], y1[idx][:, None]
            X2, Y2 = x2[idx][:, None], y2[idx][:, None]
            # edge functions (twice signed area)
            area = (X1 - X0) * (Y2 - Y0) - (X2 - X0) * (Y1 - Y0)
            w0 = (X1 - pxx) * (Y2 - pyy) - (X2 - pxx) * (Y1 - pyy)
            w1 = (X2 - pxx) * (Y0 - pyy) - (X0 - pxx) * (Y2 - pyy)
            w2 = (X0 - pxx) * (Y1 - pyy) - (X1 - pxx) * (Y0 - pyy)
            denom = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
            b0 = w0 / denom
            b1 = w1 / denom
            b2 = w2 / denom
            inside = (((b0 >= 0) & (b1 >= 0) & (b2 >= 0))
                      | ((b0 <= 0) & (b1 <= 0) & (b2 <= 0)))
            inside = inside & ok[:, None, :] & (jnp.abs(area) > 1e-9)
            z = b0 * z0[idx][:, None] + b1 * z1[idx][:, None] + b2 * z2[idx][:, None]
            z = jnp.where(inside, z, jnp.inf)
            best = jnp.argmin(z, axis=-1)                           # (C, P)
            covered = jnp.take_along_axis(inside, best[..., None], -1)[..., 0]
            bb = jnp.stack([
                jnp.take_along_axis(b0, best[..., None], -1)[..., 0],
                jnp.take_along_axis(b1, best[..., None], -1)[..., 0],
                jnp.take_along_axis(b2, best[..., None], -1)[..., 0],
            ], axis=-1)
            zbest = jnp.take_along_axis(z, best[..., None], -1)[..., 0]
            zbest = jnp.where(covered, zbest, 0.0)

            # ---- antialiased coverage (dr.antialias analog) ----
            # signed pixel distance to the triangle boundary: b_i scaled by
            # |area| / edge_length turns barycentric margins into pixels
            absarea = jnp.abs(area)
            winding = jnp.sign(jnp.where(area == 0, 1.0, area))
            len0 = jnp.sqrt((X2 - X1) ** 2 + (Y2 - Y1) ** 2) + 1e-9
            len1 = jnp.sqrt((X0 - X2) ** 2 + (Y0 - Y2) ** 2) + 1e-9
            len2 = jnp.sqrt((X1 - X0) ** 2 + (Y1 - Y0) ** 2) + 1e-9
            d = jnp.minimum(
                jnp.minimum(w0 * winding / len0, w1 * winding / len1),
                w2 * winding / len2)                           # (C, P, K)
            valid_tri = ok[:, None, :] & (jnp.abs(area) > 1e-9)
            alpha_k = jnp.where(valid_tri,
                                jnp.clip(d + 0.5, 0.0, 1.0), 0.0)
            alpha = jnp.minimum(jnp.sum(alpha_k, axis=-1), 1.0)    # (C, P)

            # nearest-triangle attributes for soft (uncovered) edge pixels:
            # clamped barycentrics of the candidate with max soft coverage
            ksoft = jnp.argmax(alpha_k, axis=-1)                   # (C, P)
            bsoft = jnp.stack([
                jnp.take_along_axis(b0, ksoft[..., None], -1)[..., 0],
                jnp.take_along_axis(b1, ksoft[..., None], -1)[..., 0],
                jnp.take_along_axis(b2, ksoft[..., None], -1)[..., 0],
            ], axis=-1)
            bsoft = jnp.clip(bsoft, 0.0, 1.0)
            bsoft = bsoft / jnp.maximum(bsoft.sum(-1, keepdims=True), 1e-9)

            A0 = jnp.take_along_axis(a0[idx], best[..., None], axis=1)
            A1 = jnp.take_along_axis(a1[idx], best[..., None], axis=1)
            A2 = jnp.take_along_axis(a2[idx], best[..., None], axis=1)
            attr = (bb[..., 0:1] * A0 + bb[..., 1:2] * A1 + bb[..., 2:3] * A2)
            S0 = jnp.take_along_axis(a0[idx], ksoft[..., None], axis=1)
            S1 = jnp.take_along_axis(a1[idx], ksoft[..., None], axis=1)
            S2 = jnp.take_along_axis(a2[idx], ksoft[..., None], axis=1)
            attr_soft = (bsoft[..., 0:1] * S0 + bsoft[..., 1:2] * S1
                         + bsoft[..., 2:3] * S2)
            attr = jnp.where(covered[..., None], attr,
                             jnp.where(alpha[..., None] > 0, attr_soft, 0.0))
            return (attr, covered, zbest,
                    jnp.where(covered[..., None], bb, 0.0), alpha)

        render_tiles = jax.checkpoint(render_tiles)
        C = self.tile_chunk
        ids = jnp.arange(n_tiles)
        pad = (-n_tiles) % C
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)]).reshape(-1, C)
        attr, covered, z, bary, alpha = jax.lax.map(render_tiles, ids)

        def untile(x, c):
            x = x.reshape(-1, TILE * TILE, c)[:n_tiles]
            x = x.reshape(n_ty, n_tx, TILE, TILE, c)
            return x.transpose(0, 2, 1, 3, 4).reshape(
                n_ty * TILE, n_tx * TILE, c)[:H, :W]

        ac = attr.shape[-1]
        return RasterOut(
            untile(attr, ac),
            untile(covered[..., None], 1)[..., 0],
            untile(z[..., None], 1)[..., 0],
            untile(bary, 3),
            untile(alpha[..., None], 1)[..., 0],
        )


def perspective_from_fov(fov_deg: float, aspect: float = 1.0,
                         znear: float = 0.01, zfar: float = 100.0) -> np.ndarray:
    """Standard OpenGL projection (refine.py uses fovy from the orbit)."""
    f = 1.0 / np.tan(np.deg2rad(fov_deg) / 2)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = f / aspect
    P[1, 1] = f
    P[2, 2] = (zfar + znear) / (znear - zfar)
    P[2, 3] = 2 * zfar * znear / (znear - zfar)
    P[3, 2] = -1.0
    return P


def verts_to_clip(verts: jnp.ndarray, mvp: jnp.ndarray) -> jnp.ndarray:
    """(V, 3) world verts through a (4, 4) column-vector MVP."""
    v_h = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=-1)
    return v_h @ mvp.T
