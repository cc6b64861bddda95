"""Tests for COLMAP readers, blender/videonvs scene loaders, scene orbit
dataset, and the PixelNeRF conditioner."""

import json
import os
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_blender_scene(root, n=4, res=16):
    from PIL import Image

    from v3d_tpu.data.cameras import get_uniform_poses

    os.makedirs(root, exist_ok=True)
    poses = get_uniform_poses(n, 2.0, 0.0, opengl=True)
    frames = []
    for i in range(n):
        img = np.zeros((res, res, 4), np.uint8)
        img[4:12, 4:12] = [200, 60, 60, 255]
        Image.fromarray(img).save(os.path.join(root, f"r_{i}.png"))
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": poses[i].tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": np.deg2rad(60.0), "frames": frames}, f)


def test_blender_loader(tmp_path):
    from v3d_tpu.data.scene_datasets import load_blender_scene

    _write_blender_scene(str(tmp_path), n=4, res=16)
    scene = load_blender_scene(str(tmp_path))
    assert scene.images.shape == (4, 16, 16, 3)
    assert scene.c2ws.shape == (4, 4, 4)
    assert scene.fg_masks.shape == (4, 16, 16)
    # alpha-composited onto white
    assert scene.images[0, 0, 0].min() == 1.0
    np.testing.assert_allclose(scene.intrinsics[0][0, 0],
                               8 / np.tan(np.deg2rad(30)), rtol=1e-5)


def test_scene_orbit_dataset(tmp_path):
    from v3d_tpu.data.objaverse import video_collate
    from v3d_tpu.data.scene_datasets import (
        SceneOrbitConfig,
        SceneOrbitDataset,
    )

    _write_blender_scene(str(tmp_path / "s1"), n=6, res=16)
    ds = SceneOrbitDataset([str(tmp_path / "s1")],
                           SceneOrbitConfig(num_frames=4))
    item = ds[0]
    assert item["frames"].shape == (4, 16, 16, 3)
    assert item["cameras"].shape == (4, 25)
    # poses normalized to radius 1.5
    c2w = item["cameras"][0][:16].reshape(4, 4)
    assert abs(np.linalg.norm(c2w[:3, 3]) - 1.5) < 0.05
    batch = video_collate([item])
    assert batch["cameras"].shape == (1, 4, 25)


def test_colmap_binary_roundtrip(tmp_path):
    from v3d_tpu.data.colmap import (
        read_cameras_binary,
        read_images_binary,
        read_points3d_binary,
    )

    cam_path = str(tmp_path / "cameras.bin")
    with open(cam_path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))           # PINHOLE
        f.write(struct.pack("<dddd", 50.0, 50.0, 32.0, 24.0))
    cams = read_cameras_binary(cam_path)
    assert cams[1].model == "PINHOLE" and cams[1].width == 64

    img_path = str(tmp_path / "images.bin")
    with open(img_path, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<ddd", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"frame1.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    imgs = read_images_binary(img_path)
    assert imgs[7].name == "frame1.png"
    np.testing.assert_allclose(imgs[7].w2c()[:3, :3], np.eye(3), atol=1e-6)

    pts_path = str(tmp_path / "points3D.bin")
    with open(pts_path, "wb") as f:
        f.write(struct.pack("<Q", 2))
        for pid in range(2):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", pid, 0.0, 1.0))
            f.write(struct.pack("<BBB", 255, 0, 0))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))
    xyz, rgb = read_points3d_binary(pts_path)
    assert xyz.shape == (2, 3) and rgb.shape == (2, 3)
    np.testing.assert_allclose(xyz[1], [1, 0, 1])


@pytest.mark.slow
def test_pixelnerf_renders():
    from v3d_tpu.data.cameras import get_uniform_poses
    from v3d_tpu.models.pixelnerf import PixelNeRF

    poses_cv = get_uniform_poses(3, 2.0, 0.0, opengl=False)
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    model = PixelNeRF(num_samples=8, near=1.0, far=3.0, feat_dim=16,
                      out_feature_dim=4)
    src = jnp.zeros((16, 16, 3))
    src_w2c = jnp.asarray(np.linalg.inv(poses_cv[0]))
    tgt = jnp.asarray(poses_cv[1:])
    Ks = jnp.asarray(np.repeat(K[None], 2, 0))
    params = model.init(jax.random.PRNGKey(0), src, src_w2c, jnp.asarray(K),
                        tgt, Ks, (8, 8))
    rgb, feats = model.apply(params, src, src_w2c, jnp.asarray(K), tgt, Ks,
                             (8, 8))
    assert rgb.shape == (2, 8, 8, 3)
    assert feats.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(rgb)).all()
