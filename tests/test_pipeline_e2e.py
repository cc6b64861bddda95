"""Full-pipeline smoke test on tiny models: image -> generate (random
weights) -> mp4 -> 3DGS fit -> ply -> re-render; plus mesh export path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_generate_to_gs_pipeline(tmp_path):
    from PIL import Image

    from v3d_tpu.apps.recon_gs import train_from_video
    from v3d_tpu.data.video_io import read_video, write_video
    from v3d_tpu.engines.builder import build_tiny_engine, init_engine_params

    # --- generate with the tiny engine (random weights -> noise video, but
    # exercises preprocess -> cond -> sample -> decode -> mp4)
    engine = build_tiny_engine(num_frames=4, num_steps=2, resolution=64)
    params = init_engine_params(engine, jax.random.PRNGKey(0), 64, 64)

    img = np.full((80, 80, 3), 255, np.uint8)
    img[20:60, 25:55] = [180, 60, 40]
    img_path = str(tmp_path / "input.png")
    Image.fromarray(img).save(img_path)

    from v3d_tpu.data.preprocess import preprocess_image

    image = preprocess_image(img, border_ratio=0.3, resolution=64)[None]
    rng = jax.random.PRNGKey(1)
    clip_emb, cond_frames = engine.encode_image(
        params, jnp.asarray(image), rng, 0.02)
    c, uc = engine.build_cond(clip_emb, cond_frames, 1, 300, 0.02)
    z = engine.sample_latents(params, rng, c, uc, 64, 64)
    frames = np.asarray(engine.decode_latents(params, z, decoding_t=2))
    assert frames.shape == (4, 64, 64, 3)

    video_path = str(tmp_path / "orbit.mp4")
    write_video(video_path, (frames * 255).astype(np.uint8), fps=3)
    assert read_video(video_path).shape == (4, 64, 64, 3)

    # --- 3DGS fit on the video (few iters, tiny point count)
    out_dir = str(tmp_path / "scene")
    trainer = train_from_video(video_path, out_dir, iterations=30,
                               num_pts=512, lambda_dssim=0.2,
                               test_every=30)
    assert os.path.exists(os.path.join(out_dir, "point_cloud.ply"))
    assert os.path.exists(os.path.join(out_dir, "spiral.mp4"))

    # --- re-render CLI from the saved ply
    from v3d_tpu.apps.render_cli import render_scene

    render_out = str(tmp_path / "renders")
    render_scene(os.path.join(out_dir, "point_cloud.ply"), render_out,
                 mode="orbit", num_frames=4, resolution=32)
    assert os.path.exists(os.path.join(render_out, "orbit.mp4"))


@pytest.mark.slow
def test_neus_mesh_export_pipeline(tmp_path):
    """Mini recon_neus: few steps then isosurface + obj/glb export."""
    from v3d_tpu.data.cameras import get_ray_directions, get_uniform_poses
    from v3d_tpu.meshops.mcubes import isosurface
    from v3d_tpu.meshops.mesh import Mesh
    from v3d_tpu.nerf.system import NeusConfig, NeusTrainer

    res, n = 16, 3
    poses = get_uniform_poses(n, 2.0, 0.0, opengl=True)
    dirs = get_ray_directions(res, res, res / (2 * np.tan(np.deg2rad(30))))
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - res / 2) ** 2 + (xx - res / 2) ** 2 < (res / 4) ** 2)
    images = np.tile(mask[None, :, :, None], (n, 1, 1, 3)).astype(np.float32)
    fg = np.repeat(mask[None], n, 0).astype(np.float32)
    cfg = NeusConfig(num_samples_per_ray=48, train_num_rays=64,
                     max_train_num_rays=64, dynamic_ray_sampling=False,
                     lambda_normal=0.0, lambda_3d_normal_smooth=0.0,
                     max_steps=25)
    trainer = NeusTrainer(images, fg, dirs, poses, config=cfg)
    for _ in range(25):
        trainer.train_iter()

    grid = trainer.sdf_grid(resolution=32)
    assert np.isfinite(grid).all()

    def sdf_fn(pts):
        import jax.numpy as jnp

        return np.asarray(trainer.geometry.apply(
            trainer.params["geometry"], jnp.asarray(pts), method="sdf",
            level_mask=trainer._level_mask()))

    verts, faces = isosurface(sdf_fn, radius=1.0, resolution=32,
                              coarse_resolution=16)
    # the CLI wiring since r5: on-device grid + jitted vertex colors
    verts2, faces2 = isosurface(None, radius=1.0, resolution=32,
                                coarse_resolution=16,
                                grid_fn=trainer.sdf_grid)
    assert abs(len(verts2) - len(verts)) <= max(8, len(verts) // 100)
    if len(verts):  # sphere-init guarantees a surface
        mesh = Mesh(verts2, faces2).auto_normal()
        mesh.vertex_colors = trainer.vertex_colors(verts2)
        assert mesh.vertex_colors.shape == (len(verts2), 3)
        mesh.write_obj(str(tmp_path / "m.obj"))
        assert os.path.exists(tmp_path / "m.obj")
