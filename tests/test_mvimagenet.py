"""MVImageNet real-format loader: a tiny synthetic archive with genuine
COLMAP binary models (images.bin/cameras.bin written per the COLMAP spec)
in the raw MVImgNet directory layout."""

import os
import struct

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from v3d_tpu.data.mvimagenet import MVImageNet, qt2c2w


def _write_cameras_bin(path, f, cx, cy, k=0.0, w=72, h=96):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        # camera_id=1, SIMPLE_RADIAL model_id=2, width, height, params f,cx,cy,k
        fh.write(struct.pack("<iiQQ", 1, 2, w, h))
        fh.write(struct.pack("<dddd", f, cx, cy, k))


def _write_images_bin(path, entries):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(entries)))
        for iid, qvec, tvec, name in entries:
            fh.write(struct.pack("<i", iid))
            fh.write(struct.pack("<dddd", *qvec))
            fh.write(struct.pack("<ddd", *tvec))
            fh.write(struct.pack("<i", 1))
            fh.write(name.encode() + b"\x00")
            fh.write(struct.pack("<Q", 0))  # no 2D points


def _quat_about_z(theta):
    return (np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2))


@pytest.fixture(scope="module")
def mvi_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvimagenet")
    rng = np.random.RandomState(0)
    for cls, scene, n in [("15", "scene_a", 8), ("15", "scene_b", 3),
                          ("42", "scene_c", 8)]:
        d = root / cls / scene
        (d / "images").mkdir(parents=True)
        (d / "sparse" / "0").mkdir(parents=True)
        entries = []
        for i in range(n):
            name = f"{i:03d}.jpg"
            img = rng.randint(0, 255, (96, 72, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / "images" / name, quality=95)
            entries.append((i + 1, _quat_about_z(0.3 * i),
                            (0.1 * i, 0.0, 4.0), name))
        _write_images_bin(d / "sparse" / "0" / "images.bin", entries)
        _write_cameras_bin(d / "sparse" / "0" / "cameras.bin",
                           f=100.0, cx=36.0, cy=48.0)
    # a scene without sparse/0 (must fall back to scene 0)
    broken = root / "42" / "scene_broken"
    (broken / "images").mkdir(parents=True)
    return str(root)


def test_items_and_mirror_extension(mvi_root):
    ds = MVImageNet(mvi_root, reso=32, num_frames=6, mask_type="center",
                    load_pixelnerf=True, scale_pose=True, seed=1)
    assert len(ds) == 4
    item = ds[0]
    assert item["frames"].shape == (6, 32, 32, 3)
    assert item["num_video_frames"] == 6
    pn = item["pixelnerf_input"]
    assert pn["cameras"].shape == (6, 25)
    assert pn["rgb"].shape == (6, 4, 4, 3)
    # scene_b has 3 frames -> mirror-extended to 6
    idx_b = ds.ids.index(os.path.join("15", "scene_b"))
    item_b = ds[idx_b]
    np.testing.assert_array_equal(item_b["frames"][3], item_b["frames"][2])
    # K normalized: f/size with size=min(72,96)=72
    K = pn["cameras"][0, 16:].reshape(3, 3)
    assert K[2, 2] == 1.0


def test_missing_sparse_falls_back(mvi_root):
    ds = MVImageNet(mvi_root, reso=16, num_frames=4, mask_type="center",
                    seed=2)
    idx_broken = ds.ids.index(os.path.join("42", "scene_broken"))
    item = ds[idx_broken]           # must not raise; uses scene 0's data
    assert item["frames"].shape == (4, 16, 16, 3)


def test_qt2c2w_is_opengl_inverse():
    q = _quat_about_z(0.7)
    t = np.array([0.3, -0.2, 5.0])
    c2w = qt2c2w(np.asarray(q), t)
    # undo the OpenGL flip and check w2c roundtrip
    c2w_cv = c2w.copy()
    c2w_cv[:, 1:3] *= -1
    w2c = np.linalg.inv(c2w_cv)
    np.testing.assert_allclose(w2c[:3, 3], t, atol=1e-6)


def test_collate_and_random_crop(mvi_root):
    ds = MVImageNet(mvi_root, reso=16, num_frames=4, mask_type="random",
                    load_pixelnerf=True, max_n_cond=2, min_n_cond=2, seed=3)
    batch = ds.collate_fn([ds[0], ds[2]])
    assert batch["frames"].shape == (8, 16, 16, 3)
    pn = batch["pixelnerf_input"]
    assert pn["rgb"].shape == (8, 2, 2, 3)
    if "source_index" in pn:
        assert (pn["source_index"][:, 0] == 0).all()
