"""Tests for marching tetrahedra, mesh IO, the differentiable rasterizer,
and texture refinement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v3d_tpu.meshops.mcubes import isosurface, marching_tets
from v3d_tpu.meshops.mesh import Mesh
from v3d_tpu.meshops.rasterize import (
    MeshRasterizer,
    perspective_from_fov,
    verts_to_clip,
)


def _sphere_sdf(pts, r=0.6):
    return np.linalg.norm(pts, axis=-1) - r


def test_marching_tets_sphere():
    n = 48
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = _sphere_sdf(grid.reshape(-1, 3)).reshape(n, n, n)
    verts, faces = marching_tets(sdf, spacing=2.0 / (n - 1))
    assert len(verts) > 100 and len(faces) > 100
    # all vertices near the r=0.6 sphere
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.6) < 0.02
    assert r.std() < 0.02
    # faces index valid vertices
    assert faces.max() < len(verts)


def test_isosurface_two_pass():
    verts, faces = isosurface(_sphere_sdf, radius=1.0, resolution=64,
                              coarse_resolution=24)
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.6) < 0.02


def test_mesh_io_roundtrip(tmp_path):
    verts, faces = isosurface(_sphere_sdf, radius=1.0, resolution=32,
                              coarse_resolution=16)
    colors = np.random.RandomState(0).rand(len(verts), 3).astype(np.float32)
    mesh = Mesh(verts, faces, vertex_colors=colors).auto_normal()
    # normals point outward for a sphere
    dots = np.sum(mesh.vertex_normals * verts / np.linalg.norm(
        verts, axis=1, keepdims=True), axis=1)
    assert (dots > 0).mean() > 0.95

    obj = str(tmp_path / "m.obj")
    mesh.write_obj(obj)
    m2 = Mesh.read_obj(obj)
    np.testing.assert_allclose(m2.vertices, mesh.vertices, rtol=1e-5)
    np.testing.assert_array_equal(m2.faces, mesh.faces)
    np.testing.assert_allclose(m2.vertex_colors, colors, atol=1e-5)

    mesh.write_ply(str(tmp_path / "m.ply"))
    mesh.write_glb(str(tmp_path / "m.glb"))
    with open(tmp_path / "m.glb", "rb") as f:
        assert f.read(4) == b"glTF"


def test_rasterizer_triangle():
    """One big triangle in front of the camera covers the image center."""
    verts = jnp.asarray([[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.5, -2.0]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    proj = jnp.asarray(perspective_from_fov(60.0))
    clip = verts_to_clip(verts, proj)
    r = MeshRasterizer(32, 32, max_per_tile=4, tile_chunk=2)
    out = r(clip, faces, colors)
    assert bool(out.mask[16, 16])
    assert not bool(out.mask[0, 0])
    # center color approx average of corners where barycentric ~ 1/3 each
    c = np.asarray(out.attr[18, 16])
    assert c.sum() > 0.9  # barycentrics sum to 1 on covered pixels
    np.testing.assert_allclose(np.asarray(out.bary[18, 16]).sum(), 1.0,
                               atol=1e-4)


def test_rasterizer_depth_order():
    # red triangle in front of blue
    verts = jnp.asarray([
        [-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.5, -2.0],   # near
        [-1.0, -1.0, -4.0], [1.0, -1.0, -4.0], [0.0, 1.5, -4.0],   # far
    ])
    faces = jnp.asarray([[3, 4, 5], [0, 1, 2]], jnp.int32)
    colors = jnp.asarray([[1.0, 0, 0]] * 3 + [[0, 0, 1.0]] * 3)
    proj = jnp.asarray(perspective_from_fov(60.0))
    out = MeshRasterizer(16, 16, 4, 2)(verts_to_clip(verts, proj), faces, colors)
    c = np.asarray(out.attr[8, 8])
    assert c[0] > 0.9 and c[2] < 0.1


@pytest.mark.slow
def test_texture_refine_converges():
    from v3d_tpu.meshops.refine import RefineConfig, TextureRefiner

    verts, faces = isosurface(_sphere_sdf, radius=1.0, resolution=24,
                              coarse_resolution=12)
    mesh = Mesh(verts, faces)
    # target: solid green object on white bg from every view
    T, res = 4, 32
    frames = np.ones((T, res, res, 3), np.float32)
    # render coverage mask per view to paint only the object green
    cfg = RefineConfig(iters=150, num_opt_views=4, max_per_tile=512,
                       tile_chunk=2, radius=2.0, lr=0.05)
    refiner = TextureRefiner(mesh, frames, cfg)
    img0, mask0 = jax.jit(refiner.render)(refiner.logits, 0)
    frames = np.ones((T, res, res, 3), np.float32)
    for i in range(T):
        _, m = jax.jit(refiner.render)(refiner.logits, i)
        m = np.asarray(m)
        frames[i][m > 0.5] = [0.1, 0.8, 0.1]
    refiner = TextureRefiner(mesh, frames, cfg)
    losses = refiner.run(150)
    assert losses[-1] < losses[0] * 0.5
    out = refiner.export()
    green = out.vertex_colors[:, 1].mean()
    assert green > out.vertex_colors[:, 0].mean()


def test_native_marching_tets_matches_numpy():
    from v3d_tpu.meshops.mcubes import marching_tets
    from v3d_tpu.native import marching_tets_native

    n = 32
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
    sdf = _sphere_sdf(grid.reshape(-1, 3)).reshape(n, n, n).astype(np.float32)
    out = marching_tets_native(sdf)
    if out is None:
        pytest.skip("native toolchain unavailable")
    v_np, f_np = marching_tets(sdf, spacing=2.0 / (n - 1), use_native=False)
    v_cc, f_cc = marching_tets(sdf, spacing=2.0 / (n - 1), use_native=True)
    # same surface: radius statistics agree, similar counts, valid faces
    for v, f in ((v_np, f_np), (v_cc, f_cc)):
        r = np.linalg.norm(v, axis=1)
        assert abs(r.mean() - 0.6) < 0.02
        assert f.max() < len(v)
    assert abs(len(f_cc) - len(f_np)) < 0.1 * len(f_np) + 10
    # native is watertight-welded: every edge appears exactly twice
    edges = {}
    for tri in f_cc:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).mean() > 0.99


def test_rasterizer_aa_alpha_edge_gradients():
    """dr.antialias analog: d(alpha)/d(verts) is non-zero for silhouette
    pixels, alpha is 1 deep inside, partial on the edge, and interior
    shared edges do not create seams."""
    import jax

    proj = jnp.asarray(perspective_from_fov(60.0))
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.ones((3, 3))
    r = MeshRasterizer(32, 32, max_per_tile=4, tile_chunk=2)

    def alpha_sum(verts):
        out = r(verts_to_clip(verts, proj), faces, colors)
        return jnp.sum(out.alpha), out

    verts = jnp.asarray([[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0],
                         [0.0, 1.5, -2.0]])
    (total, out), grads = jax.value_and_grad(alpha_sum, has_aux=True)(verts)
    assert float(jnp.abs(grads).max()) > 0          # edge pixels give grads
    assert float(out.alpha[16, 16]) == 1.0          # deep inside: full
    # moving vertices outward increases coverage: directional check
    eps = 1e-3
    grown = verts * jnp.asarray([[1 + eps, 1 + eps, 1.0]] * 3)
    total2, _ = alpha_sum(grown)
    predicted = float(jnp.vdot(grads, grown - verts))
    actual = float(total2 - total)
    assert actual > 0 and predicted > 0
    assert abs(predicted - actual) / abs(actual) < 0.2

    # interior shared edge: split quad into 2 triangles -> alpha == 1 across
    quad_v = jnp.asarray([[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0],
                          [1.0, 1.0, -2.0], [-1.0, 1.0, -2.0]])
    quad_f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    out_q = r(verts_to_clip(quad_v, proj), quad_f, jnp.ones((4, 3)))
    # the diagonal runs through the center: no seam
    assert float(out_q.alpha[16, 16]) == 1.0
    assert float(out_q.alpha[10, 10]) == 1.0


def test_atlas_unwrap_cube():
    """UV unwrap of a cube: 6 charts, uvs in [0,1], geometry preserved
    through the vertex remap, no chart rectangle overlaps."""
    from v3d_tpu.meshops.uv import atlas_unwrap

    # unit cube, 12 triangles
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float32)
    quads = [  # (a,b,c,d) per face, outward order
        (0, 1, 3, 2), (4, 6, 7, 5),  # -x +x
        (0, 4, 5, 1), (2, 3, 7, 6),  # -y +y
        (0, 2, 6, 4), (1, 5, 7, 3),  # -z +z
    ]
    f = []
    for a, b, c, d in quads:
        f += [(a, b, c), (a, c, d)]
    f = np.asarray(f, np.int32)

    vmapping, ft, vt = atlas_unwrap(v, f)
    assert vt.min() >= 0.0 and vt.max() <= 1.0
    assert ft.shape == f.shape
    # geometry preserved: positions referenced by ft (via vmapping) match
    np.testing.assert_allclose(v[vmapping][ft], v[f], atol=0)
    # 6 charts: 24 uv vertices (4 per face-chart)
    assert len(vt) == 24
    # charts don't overlap: their bounding rectangles are disjoint
    chart_of_vt = np.repeat(np.arange(6), 4)
    rects = []
    for ci in range(6):
        sel = vt[chart_of_vt == ci]
        rects.append((*sel.min(0), *sel.max(0)))
    for i in range(6):
        for j in range(i + 1, 6):
            ax0, ay0, ax1, ay1 = rects[i]
            bx0, by0, bx1, by1 = rects[j]
            disjoint = ax1 <= bx0 or bx1 <= ax0 or ay1 <= by0 or by1 <= ay0
            assert disjoint, (i, j, rects[i], rects[j])


def test_mesh_auto_uv_roundtrip(tmp_path):
    """Mesh.auto_uv with vmap duplicates boundary vertices and caches."""
    from v3d_tpu.meshops.mesh import Mesh

    rng = np.random.RandomState(0)
    # icosahedron-ish: use a random convex hull-ish blob via sphere samples
    pts = rng.randn(40, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    # build faces via convex hull (scipy absent: use a small fixed sphere
    # triangulation instead — an octahedron subdivided once)
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    m = Mesh(vertices=v.copy(), faces=f.copy()).auto_normal()
    nv0 = len(m.vertices)
    cache = str(tmp_path / "mesh.obj")
    m.auto_uv(cache_path=cache)
    assert m.uvs is not None and m.uvs.shape == (len(m.vertices), 2)
    assert len(m.vertices) >= nv0  # boundary duplication
    assert (tmp_path / "mesh_uv.npz").exists()
    # second call loads the cache
    m2 = Mesh(vertices=v.copy(), faces=f.copy())
    m2.auto_uv(cache_path=cache)
    np.testing.assert_allclose(m.uvs, m2.uvs)
