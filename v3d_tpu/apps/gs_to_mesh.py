"""3DGS -> mesh distillation (counterpart of recon/convert_nerf_mesh.py:
fit_nerf :208 -> marching cubes -> fit_mesh/fit_mesh_uv :300/:424 -> glb).

Renders the trained gaussians on a dense orbit, distills them into a density
NeRF (our NerfField), extracts the isosurface (marching tetrahedra) and
optionally refines per-vertex colors against the renders.

    python -m v3d_tpu.apps.gs_to_mesh --ply scene/point_cloud.ply --output mesh/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def distill(ply_path: str, output: str, n_views: int = 36,
            fit_steps: int = 1500, rays_per_step: int = 4096,
            resolution: int = 256, mc_resolution: int = 192,
            radius: float = 1.0, cam_radius: float = 2.0,
            refine_iters: int = 500, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from v3d_tpu.data.cameras import (
        Camera,
        fov2focal,
        get_ray_directions,
        get_uniform_poses,
    )
    from v3d_tpu.gs.gaussians import GaussianParams
    from v3d_tpu.gs.ply import load_ply
    from v3d_tpu.gs.render import render
    from v3d_tpu.meshops.mcubes import isosurface
    from v3d_tpu.meshops.mesh import Mesh
    from v3d_tpu.meshops.refine import RefineConfig, TextureRefiner
    from v3d_tpu.nerf.nerf_model import NerfField, NerfRenderer

    rs = np.random.RandomState(seed)
    g_np = load_ply(ply_path)
    g = GaussianParams(**{k: jnp.asarray(v) for k, v in g_np.items()})

    # 1. render a dense orbit of supervision views (fit_nerf data)
    poses_cv = get_uniform_poses(n_views, cam_radius, 0.0)
    bg = jnp.ones(3)
    images = []
    for p in poses_cv:
        cam = Camera.from_c2w(p, 60.0, resolution, resolution)
        images.append(np.asarray(render(g, cam, bg,
                                        active_sh_degree=g.sh_degree).image))
    images = np.clip(np.stack(images), 0, 1)

    # 2. fit the density NeRF on random rays
    poses_gl = get_uniform_poses(n_views, cam_radius, 0.0, opengl=True)
    focal = fov2focal(np.deg2rad(60.0), resolution)
    dirs = get_ray_directions(resolution, resolution, focal)
    field = NerfField(radius=radius)
    renderer = NerfRenderer(radius=radius, num_samples=192)
    params = field.init(jax.random.PRNGKey(seed), jnp.zeros((4, 3)),
                        jnp.zeros((4, 3)))
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    images_j = jnp.asarray(images)
    poses_j = jnp.asarray(poses_gl)
    dirs_j = jnp.asarray(dirs)

    @jax.jit
    def step(params, opt_state, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        idx = jax.random.randint(r1, (rays_per_step,), 0, n_views)
        xy = jax.random.randint(r2, (rays_per_step, 2), 0, resolution)
        d_cam = dirs_j[xy[:, 1], xy[:, 0]]
        c2w = poses_j[idx]
        rd = jnp.einsum("nij,nj->ni", c2w[:, :3, :3], d_cam)
        rd = rd / (jnp.linalg.norm(rd, axis=-1, keepdims=True) + 1e-12)
        ro = c2w[:, :3, 3]
        target = images_j[idx, xy[:, 1], xy[:, 0]]

        def loss_fn(params):
            out = renderer(ro, rd, lambda p, d: field.apply(params, p, d),
                           background_color=jnp.ones(3), rng=r3)
            return jnp.mean((out.comp_rgb - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed + 1)
    for i in range(fit_steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if (i + 1) % 300 == 0:
            print(f"distill step {i+1} loss {float(loss):.5f}")

    # 3. isosurface on density (threshold at sigma*step ~ alpha 0.5)
    def density_fn(pts):
        out = []
        for s in range(0, len(pts), 262144):
            chunk = jnp.asarray(pts[s:s + 262144])
            d, _ = field.apply(params, chunk, method="density_feature")
            out.append(np.asarray(d))
        # level set: inside = high density -> negative "sdf"
        return 5.0 - np.concatenate(out)

    verts, faces = isosurface(density_fn, radius=radius,
                              resolution=mc_resolution)
    mesh = Mesh(verts, faces).auto_normal()
    print(f"extracted mesh: {len(verts)} verts, {len(faces)} faces")

    # 4. bake colors by refining against the rendered orbit
    if refine_iters > 0 and len(verts) > 0:
        refiner = TextureRefiner(
            mesh, images, RefineConfig(iters=refine_iters, lr=0.05,
                                       num_opt_views=min(16, n_views),
                                       radius=cam_radius))
        refiner.run()
        mesh = refiner.export()

    os.makedirs(output, exist_ok=True)
    mesh.write_glb(os.path.join(output, "mesh.glb"))
    mesh.write_obj(os.path.join(output, "mesh.obj"))
    print(f"saved {output}/mesh.glb")
    return mesh


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ply", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--fit-steps", type=int, default=1500)
    p.add_argument("--mc-resolution", type=int, default=192)
    p.add_argument("--refine-iters", type=int, default=500)
    args = p.parse_args()
    distill(args.ply, args.output, fit_steps=args.fit_steps,
            mc_resolution=args.mc_resolution, refine_iters=args.refine_iters)


if __name__ == "__main__":
    main()
