"""Tests for camera paths, NeRF field, video/image IO, disk dataset, LPIPS
math, safety filter and watermark."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_slerp_and_interp():
    from v3d_tpu.data.cam_paths import (
        get_interpolated_path,
        interpolate_poses,
        matrix_from_quat,
        quat_from_matrix,
        slerp,
    )
    from v3d_tpu.data.cameras import get_uniform_poses

    poses = get_uniform_poses(4, 2.0, 0.0)
    # quat roundtrip
    for p in poses:
        R = p[:3, :3]
        np.testing.assert_allclose(matrix_from_quat(quat_from_matrix(R)), R,
                                   atol=1e-6)
    mid = interpolate_poses(poses[0], poses[1], 0.5)
    # positions lerp: chord midpoint of a radius-2 arc 90 deg apart
    assert abs(np.linalg.norm(mid[:3, 3]) - 2 * np.cos(np.pi / 4)) < 1e-4
    path = get_interpolated_path(poses, steps_per_transition=5)
    assert path.shape == (20, 4, 4)
    # orthonormal rotations throughout
    RRT = path[:, :3, :3] @ path[:, :3, :3].transpose(0, 2, 1)
    np.testing.assert_allclose(RRT, np.eye(3)[None].repeat(20, 0), atol=1e-5)


def test_auto_orient():
    from v3d_tpu.data.cam_paths import auto_orient_and_center_poses
    from v3d_tpu.data.cameras import get_uniform_poses

    poses = get_uniform_poses(8, 2.0, 30.0, opengl=True)
    poses[:, :3, 3] += np.array([5.0, 0, 0])  # off-center scene
    out, tf = auto_orient_and_center_poses(poses)
    assert np.linalg.norm(out[:, :3, 3].mean(0)) < 1e-4


@pytest.mark.slow
def test_nerf_field_and_renderer():
    from v3d_tpu.nerf.nerf_model import NerfField, NerfRenderer, trunc_exp

    # trunc_exp gradient is clamped
    g = jax.grad(lambda x: trunc_exp(x))(100.0)
    assert np.isfinite(float(g))

    field = NerfField(radius=1.0, n_levels=4, base_resolution=4)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.zeros((4, 3)))
    renderer = NerfRenderer(radius=1.0, num_samples=32)
    rays_o = jnp.asarray([[-2.0, 0, 0]])
    rays_d = jnp.asarray([[1.0, 0, 0]])
    out = renderer(rays_o, rays_d,
                   lambda p, d: field.apply(params, p, d))
    assert np.isfinite(np.asarray(out.comp_rgb)).all()
    assert 0.0 <= float(out.opacity[0]) <= 1.0


def test_video_io_roundtrip(tmp_path):
    from v3d_tpu.data.video_io import read_video, save_image_grid, write_video

    # structured frames (flat colors) so the lossy codec stays accurate
    frames = np.zeros((4, 32, 32, 3), np.uint8)
    for i, c in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255), (200, 200, 0)]):
        frames[i] = c
    path = str(tmp_path / "test.mp4")
    write_video(path, frames, fps=3)
    back = read_video(path)
    assert back.shape == frames.shape
    assert np.abs(back.astype(int) - frames.astype(int)).mean() < 15
    save_image_grid(str(tmp_path / "grid.png"), frames)
    assert os.path.exists(tmp_path / "grid.png")


def test_orbit_render_dataset(tmp_path):
    from PIL import Image

    from v3d_tpu.data.objaverse import OrbitItemConfig, OrbitRenderDataset

    obj = tmp_path / "obj1"
    obj.mkdir()
    for i in range(4):
        Image.fromarray((np.random.RandomState(i).rand(16, 16, 3) * 255
                         ).astype(np.uint8)).save(obj / f"{i:03d}.png")
    ds = OrbitRenderDataset(str(tmp_path), OrbitItemConfig(num_frames=4))
    item = ds[0]
    assert item["frames"].shape == (4, 16, 16, 3)
    assert item["frames"].min() >= -1.0 and item["frames"].max() <= 1.0
    batch = next(ds.iter_batches(1))
    assert batch["frames"].shape == (4, 16, 16, 3)

    # latents shortcut
    obj2 = tmp_path / "obj2"
    obj2.mkdir()
    np.save(obj2 / "latents.npy", np.zeros((4, 8, 8, 4), np.float32))
    np.save(obj2 / "clip_emb.npy", np.ones((1, 16), np.float32))
    ds2 = OrbitRenderDataset(str(tmp_path), OrbitItemConfig(num_frames=4))
    item2 = ds2[1]  # obj2 sorted second
    assert "latents" in item2
    assert item2["cond_frames_without_noise"].shape == (1, 16)


def test_lpips_math():
    from v3d_tpu.metrics.lpips import VGG_PLAN, lpips_distance

    rs = np.random.RandomState(0)
    params = {}
    conv_i = 0
    in_ch = 3
    for spec in VGG_PLAN:
        if spec == "M":
            continue
        params[f"conv{conv_i}_w"] = jnp.asarray(
            rs.randn(3, 3, in_ch, spec).astype(np.float32) * 0.05)
        params[f"conv{conv_i}_b"] = jnp.zeros((spec,))
        in_ch = spec
        conv_i += 1
    for i, ch in enumerate([64, 128, 256, 512, 512]):
        params[f"lin{i}"] = jnp.asarray(rs.rand(ch).astype(np.float32))
    x = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    d_same = lpips_distance(params, x, x)
    assert float(d_same[0]) == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    assert float(lpips_distance(params, x, y)[0]) > 0


def test_safety_filter_passthrough_and_watermark():
    from v3d_tpu.utils.safety import (
        WATERMARK_BITS,
        DeepFloydDataFiltering,
        embed_watermark,
        extract_watermark,
    )

    filt = DeepFloydDataFiltering()
    imgs = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    out = filt(imgs)
    np.testing.assert_array_equal(out, imgs)

    # dwtDct round trip (imwatermark EmbedMaxDct semantics), surviving the
    # uint8 quantization of an image save
    imgs = np.random.RandomState(1).rand(2, 512, 512, 3).astype(np.float32)
    wm = embed_watermark(imgs)
    assert wm.shape == imgs.shape
    wm8 = np.round(wm * 255).astype(np.uint8).astype(np.float32) / 255.0
    bits = extract_watermark(wm8)
    assert np.array_equal(bits.astype(int), np.array(WATERMARK_BITS))
    assert not np.array_equal(extract_watermark(imgs).astype(int),
                              np.array(WATERMARK_BITS))


@pytest.mark.slow
def test_unet2d_runs():
    from v3d_tpu.models.unet2d import UNetModel

    net = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                    num_res_blocks=1, attention_resolutions=(1,),
                    channel_mult=(1, 2), num_head_channels=16, context_dim=32)
    x = jnp.zeros((2, 16, 16, 4))
    params = net.init(jax.random.PRNGKey(0), x, jnp.ones((2,)),
                      jnp.zeros((2, 3, 32)))
    out = net.apply(params, x, jnp.ones((2,)), jnp.zeros((2, 3, 32)))
    assert out.shape == (2, 16, 16, 4)


def test_safety_head_real_weights():
    """Run the linear-probe heads with the v1 npz layout (uses the reference
    distribution's head files when present)."""
    import os

    from v3d_tpu.utils.safety import _run_head

    path = "/root/reference/scripts/util/detection/p_head_v1.npz"
    if not os.path.exists(path):
        pytest.skip("reference head weights not present")
    head = dict(np.load(path))
    feats = np.random.RandomState(0).randn(3, 768).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    scores = _run_head(head, feats)
    assert scores.shape == (3,)
    assert np.all((scores >= 0) & (scores <= 1))


def test_conv1x1_equals_linear():
    """scripts/tests/attention.py test01: a 1x1 conv is a linear layer."""
    import flax.linen as nn

    conv = nn.Conv(8, (1, 1))
    x = np.random.RandomState(0).randn(2, 4, 4, 6).astype(np.float32)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_conv = conv.apply(params, jnp.asarray(x))
    w = params["params"]["kernel"][0, 0]  # (in, out)
    b = params["params"]["bias"]
    out_lin = jnp.asarray(x) @ w + b
    np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_lin),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_image_diffusion_engine():
    from v3d_tpu.diffusion.denoise import Denoiser
    from v3d_tpu.diffusion.discretize import EDMDiscretization
    from v3d_tpu.diffusion.guidance import VanillaCFG
    from v3d_tpu.diffusion.sampling import EulerEDMSampler
    from v3d_tpu.diffusion.scaling import VScalingWithEDMcNoise
    from v3d_tpu.engines.image_diffusion import ImageDiffusionEngine
    from v3d_tpu.models.unet2d import UNetModel

    unet = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(1,),
                     channel_mult=(1, 2), num_head_channels=16,
                     context_dim=32)
    params = {"unet": unet.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 4)),
                                jnp.ones((2,)), jnp.zeros((2, 3, 32)))}
    engine = ImageDiffusionEngine(
        unet=unet, denoiser=Denoiser(scaling=VScalingWithEDMcNoise()),
        sampler=EulerEDMSampler(discretization=EDMDiscretization(),
                                num_steps=3, guider=VanillaCFG(scale=2.0)))
    c = {"crossattn": jnp.ones((1, 3, 32))}
    uc = {"crossattn": jnp.zeros((1, 3, 32))}
    z = engine.sample(params, jax.random.PRNGKey(1), c, uc, batch=1,
                      height=64, width=64)
    assert z.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(z)).all()
    z2 = engine.img2img(params, jax.random.PRNGKey(2), z, c, uc, strength=0.5)
    assert z2.shape == z.shape


def test_export_blender_cameras(tmp_path):
    import json

    from v3d_tpu.apps.render_cli import export_blender_cameras

    path = export_blender_cameras(str(tmp_path), num_frames=4)
    with open(path) as f:
        meta = json.load(f)
    assert len(meta["frames"]) == 4
    tm = np.asarray(meta["frames"][0]["transform_matrix"])
    assert tm.shape == (4, 4)


def test_snapshot_run(tmp_path):
    """Code/config snapshot (reference utils/callbacks.py analog)."""
    import dataclasses
    import tarfile

    from v3d_tpu.utils.snapshot import snapshot_run

    @dataclasses.dataclass
    class Cfg:
        lr: float = 1e-4
        steps: int = 10

    snap = snapshot_run(str(tmp_path), config=Cfg())
    import json
    import os

    cfg = json.load(open(os.path.join(snap, "config.json")))
    assert cfg["lr"] == 1e-4 and cfg["steps"] == 10
    git_txt = open(os.path.join(snap, "git.txt")).read()
    assert git_txt.startswith("HEAD ")
    with tarfile.open(os.path.join(snap, "code.tar.gz")) as tar:
        names = tar.getnames()
    assert any(n.endswith("gs/trainer.py") for n in names)


def test_depth_colormap():
    from v3d_tpu.utils.colormaps import apply_depth_colormap, turbo

    x = np.linspace(0, 1, 11)
    rgb = turbo(x)
    assert rgb.shape == (11, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    # turbo: blue-dominant low end, red-dominant high end
    assert rgb[1, 2] > rgb[1, 0] and rgb[-2, 0] > rgb[-2, 2]

    d = np.linspace(1.0, 3.0, 64).reshape(8, 8)
    acc = np.ones((8, 8)); acc[0, 0] = 0.0
    out = apply_depth_colormap(d, accumulation=acc)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out[0, 0], [1, 1, 1], atol=1e-6)  # bg white
