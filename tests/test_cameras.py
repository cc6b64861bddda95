"""Tests for camera paths / projections / preprocessing."""

import numpy as np

from v3d_tpu.data.cameras import (
    Camera,
    focal2fov,
    fov2focal,
    get_ray_directions,
    get_rays,
    get_uniform_poses,
    orbit_cameras,
    projection_matrix,
    world2view,
)
from v3d_tpu.data.preprocess import preprocess_image, recenter


def test_uniform_poses_orbit():
    poses = get_uniform_poses(18, 2.0, 0.0)
    assert poses.shape == (18, 4, 4)
    # camera positions on the radius-2 circle at z=0
    pos = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(pos, axis=1), 2.0, rtol=1e-5)
    np.testing.assert_allclose(pos[:, 2], 0.0, atol=1e-6)
    # first camera at (2, 0, 0); forward (+z col) points at origin
    np.testing.assert_allclose(pos[0], [2, 0, 0], atol=1e-6)
    fwd = poses[0, :3, 2]
    np.testing.assert_allclose(fwd, [-1, 0, 0], atol=1e-6)
    # azimuth step 20 deg
    np.testing.assert_allclose(
        pos[1], [2 * np.cos(np.deg2rad(20)), 2 * np.sin(np.deg2rad(20)), 0],
        atol=1e-6)
    # rotations orthonormal
    R = poses[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.eye(3)[None].repeat(18, 0), atol=1e-5)


def test_opengl_flip():
    p_cv = get_uniform_poses(4, 2.0, 0.0, opengl=False)
    p_gl = get_uniform_poses(4, 2.0, 0.0, opengl=True)
    np.testing.assert_allclose(p_gl[:, :, 0], p_cv[:, :, 0])
    np.testing.assert_allclose(p_gl[:, :3, 1], -p_cv[:, :3, 1])
    np.testing.assert_allclose(p_gl[:, :3, 2], -p_cv[:, :3, 2])


def test_fov_focal_roundtrip():
    fov = np.deg2rad(60)
    f = fov2focal(fov, 512)
    assert abs(focal2fov(f, 512) - fov) < 1e-9


def test_camera_center_matches_pose():
    cams = orbit_cameras(6, radius=2.0, elevation=0.0, fov_deg=60, resolution=64)
    poses = get_uniform_poses(6, 2.0, 0.0)
    for cam, pose in zip(cams, poses):
        np.testing.assert_allclose(cam.camera_center, pose[:3, 3], atol=1e-4)


def test_projection_projects_center_point():
    """A point in front of the camera projects into NDC [-1,1]^2; the look-at
    target (origin) projects to NDC (0, 0)."""
    cams = orbit_cameras(4, radius=2.0, fov_deg=60, resolution=64)
    cam = cams[0]
    p = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    clip = p @ cam.full_proj_transform
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)
    # depth of origin = 2.0 in view space
    view = p @ cam.world_view_transform
    np.testing.assert_allclose(view[2], 2.0, atol=1e-5)


def test_ray_directions_center_pixel():
    dirs = get_ray_directions(4, 4, focal=2.0)
    assert dirs.shape == (4, 4, 3)
    # all rays point along -z in camera space
    assert np.all(dirs[..., 2] == -1)
    c2w = np.eye(4, dtype=np.float32)
    o, d = get_rays(dirs, c2w)
    np.testing.assert_allclose(o, 0.0)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)


def test_recenter_centers_object():
    img = np.zeros((64, 64, 4), np.uint8)
    img[10:20, 40:50] = 255  # 10x10 object off-center
    mask = img[..., 3] > 0
    out = recenter(img, mask, border_ratio=0.5)
    assert out.shape == (64, 64, 4)
    coords = np.nonzero(out[..., 3] > 0)
    cx = (coords[0].min() + coords[0].max()) / 2
    cy = (coords[1].min() + coords[1].max()) / 2
    assert abs(cx - 32) <= 2 and abs(cy - 32) <= 2
    # object spans ~50% of canvas
    span = coords[0].max() - coords[0].min()
    assert 28 <= span <= 34


def test_preprocess_image_range():
    img = np.full((100, 80, 3), 255, np.uint8)
    img[30:70, 20:60] = 128
    out = preprocess_image(img, border_ratio=0.3, resolution=64)
    assert out.shape == (64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
