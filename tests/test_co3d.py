"""CO3Dv2 real-format loader tests against a synthetic archive written in
the exact on-disk layout (frame_annotations.jgz etc. — see
v3d_tpu/data/co3d.py docstring and sgm/data/co3d.py:315-700)."""

import gzip
import json
import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from v3d_tpu.data.co3d import (
    Co3dDataset,
    clamp_bbox,
    get_bbox_from_mask,
    ndc_to_screen,
    opencv_to_pixelnerf_camera,
    resize_longest,
    screen_to_opencv_camera,
)


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def co3d_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("co3d_root")
    cat = root / "hydrant"
    (cat / "set_lists").mkdir(parents=True)
    rng = np.random.RandomState(0)
    annots, set_train = [], []
    for s, seq in enumerate(["seq_a", "seq_b", "tiny_seq"]):
        n = 12 if seq != "tiny_seq" else 4   # tiny_seq must be filtered out
        for i in range(n):
            img_rel = f"hydrant/{seq}/images/frame{i:06d}.jpg"
            mask_rel = f"hydrant/{seq}/masks/frame{i:06d}.png"
            os.makedirs(os.path.dirname(root / img_rel), exist_ok=True)
            os.makedirs(os.path.dirname(root / mask_rel), exist_ok=True)
            h, w = 48, 64
            img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / img_rel, quality=95)
            mask = np.zeros((h, w), np.uint8)
            mask[10:38, 20:52] = 255
            Image.fromarray(mask, "L").save(root / mask_rel)
            annots.append({
                "sequence_name": seq,
                "frame_number": i,
                "frame_timestamp": float(n - i),  # reversed: tests sorting
                "image": {"path": img_rel, "size": [h, w]},
                "mask": {"path": mask_rel, "mass": float(mask.sum())},
                "viewpoint": {
                    "R": _rot(0.3 * i + s).tolist(),
                    "T": [0.1 * i, 0.0, 4.0],
                    "focal_length": [2.0, 2.1],
                    "principal_point": [0.05, -0.02],
                    "intrinsics_format": "ndc_isotropic",
                },
            })
            set_train.append([seq, i, img_rel])
    with gzip.open(cat / "frame_annotations.jgz", "wt") as f:
        json.dump(annots, f)
    with gzip.open(cat / "sequence_annotations.jgz", "wt") as f:
        json.dump([{"sequence_name": s, "category": "hydrant"}
                   for s in ["seq_a", "seq_b", "tiny_seq"]], f)
    with open(cat / "set_lists" / "set_lists_fewview_train.json", "w") as f:
        json.dump({"train": set_train, "val": [], "test": set_train}, f)
    return str(root)


def test_sequences_filtered_and_items(co3d_root):
    ds = Co3dDataset(co3d_root, category="hydrant", num_frames=20,
                     sample_batch_size=12, reso=64, seed=1)
    assert ds.seq_list == ["seq_a", "seq_b"]  # tiny_seq dropped (<=10)
    item = ds[0]
    assert item["frames"].shape == (20, 64, 64, 3)   # mirror-padded 12->20
    assert item["masks"].shape == (20, 64, 64, 1)
    assert item["num_video_frames"] == 20
    assert item["frames"].min() >= -1.0 and item["frames"].max() <= 1.0
    # mirror pad: frame 12 == flip of the 12-frame stack's first element
    np.testing.assert_array_equal(item["frames"][12], item["frames"][11])
    pn = item["pixelnerf_input"]
    assert pn["cameras"].shape == (20, 25)
    assert pn["rgb"].shape == (20, 8, 8, 3)
    # scale_pose applied: max radius 1.5
    c2ws = pn["cameras"][:, :16].reshape(20, 4, 4)
    center = c2ws[:, :3, 3].mean(axis=0)
    assert np.linalg.norm(c2ws[:, :3, 3] - center,
                          axis=-1).max() == pytest.approx(1.5, rel=1e-4)


def test_timestamp_ordering(co3d_root):
    ds = Co3dDataset(co3d_root, category="hydrant", num_frames=12,
                     sample_batch_size=12, reso=32, stage="test",
                     load_pixelnerf=False, seed=2)
    item = ds[0]
    # timestamps were reversed on disk; items must come out time-sorted,
    # so the LAST annotation (largest frame index, smallest timestamp)
    # must be frame 0 of the item
    assert item["frames"].shape[0] == 12


def test_bbox_and_resize_helpers():
    mask = np.zeros((40, 60), np.float32)
    mask[10:30, 15:45] = 1.0
    x, y, bw, bh = get_bbox_from_mask(mask, 0.4)
    assert (x, y) == (15, 10) and (bw, bh) == (29, 19)
    x0, y0, x1, y1 = clamp_bbox((x, y, bw, bh), 0.3, 40, 60)
    assert x0 <= 15 and y0 <= 10 and x1 <= 60 and y1 <= 40
    img = np.random.RandomState(0).rand(30, 50, 3).astype(np.float32)
    out, scale, valid = resize_longest(img, 64)
    assert out.shape == (64, 64, 3)
    assert scale == pytest.approx(64 / 50)
    assert valid[:int(30 * scale), :64].all()
    assert not valid[int(30 * scale) + 1:].any()


def test_camera_chain_roundtrip():
    vp = {"R": _rot(0.7).tolist(), "T": [0.2, -0.1, 3.0],
          "focal_length": [2.0, 2.0], "principal_point": [0.0, 0.0],
          "intrinsics_format": "ndc_isotropic"}
    focal, pp = ndc_to_screen(vp, (48, 64))
    # isotropic: rescale = min(h,w)/2 = 24 -> focal 48px, pp at center
    np.testing.assert_allclose(focal, [48.0, 48.0])
    np.testing.assert_allclose(pp, [32.0, 24.0])
    R, t, K = screen_to_opencv_camera(vp, focal, pp)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    cam = opencv_to_pixelnerf_camera(R, t, K, norm=256.0)
    assert cam.shape == (25,)
    c2w = cam[:16].reshape(4, 4)
    # flipped y/z columns keep |det| = 1
    assert abs(abs(np.linalg.det(c2w[:3, :3])) - 1.0) < 1e-5
    # K normalization: bottom row untouched
    np.testing.assert_allclose(cam[16:].reshape(3, 3)[2], [0, 0, 1])


def test_collate_multi_cond(co3d_root):
    ds = Co3dDataset(co3d_root, category="hydrant", num_frames=20,
                     sample_batch_size=12, reso=32, max_n_cond=3,
                     min_n_cond=3, seed=3)
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["frames"].shape == (40, 32, 32, 3)
    pn = batch["pixelnerf_input"]
    assert pn["rgb"].shape == (40, 4, 4, 3)
    assert pn["source_index"].shape == (2, 3)
    assert (pn["source_index"][:, 0] == 0).all()
