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
    load_depth_png,
    load_pointcloud_ply,
    ndc_to_screen,
    opencv_to_pixelnerf_camera,
    resize_longest,
    save_depth_png,
    screen_to_opencv_camera,
)


def _write_ply(path, pts, cols_u8):
    with open(path, "wb") as f:
        f.write((
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n").encode("ascii"))
        rec = np.zeros(len(pts), dtype=[("x", "<f4"), ("y", "<f4"),
                                        ("z", "<f4"), ("red", "u1"),
                                        ("green", "u1"), ("blue", "u1")])
        for i, k in enumerate("xyz"):
            rec[k] = pts[:, i]
        for i, k in enumerate(("red", "green", "blue")):
            rec[k] = cols_u8[:, i]
        f.write(rec.tobytes())


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
            depth_rel = f"hydrant/{seq}/depths/frame{i:06d}.png"
            dmask_rel = f"hydrant/{seq}/depth_masks/frame{i:06d}.png"
            os.makedirs(os.path.dirname(root / img_rel), exist_ok=True)
            os.makedirs(os.path.dirname(root / mask_rel), exist_ok=True)
            os.makedirs(os.path.dirname(root / depth_rel), exist_ok=True)
            os.makedirs(os.path.dirname(root / dmask_rel), exist_ok=True)
            h, w = 48, 64
            img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / img_rel, quality=95)
            mask = np.zeros((h, w), np.uint8)
            mask[10:38, 20:52] = 255
            Image.fromarray(mask, "L").save(root / mask_rel)
            # CO3D 16-bit float16-reinterpret depth + 1-bit validity mask
            depth = (2.0 + 0.5 * rng.rand(h, w)).astype(np.float32)
            save_depth_png(str(root / depth_rel), depth)
            Image.fromarray((mask > 0).astype(np.uint8) * 255,
                            "L").save(root / dmask_rel)
            annots.append({
                "sequence_name": seq,
                "frame_number": i,
                "frame_timestamp": float(n - i),  # reversed: tests sorting
                "image": {"path": img_rel, "size": [h, w]},
                "mask": {"path": mask_rel, "mass": float(mask.sum())},
                "depth": {"path": depth_rel, "scale_adjustment": 0.5,
                          "mask_path": dmask_rel},
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
    # per-sequence point cloud plys + annotations carrying their paths
    pcl_pts = rng.randn(500, 3).astype(np.float32)
    pcl_cols = rng.randint(0, 255, (500, 3), dtype=np.uint8)
    seq_annots = []
    for s in ["seq_a", "seq_b", "tiny_seq"]:
        ply_rel = f"hydrant/{s}/pointcloud.ply"
        os.makedirs(os.path.dirname(root / ply_rel), exist_ok=True)
        _write_ply(root / ply_rel, pcl_pts, pcl_cols)
        seq_annots.append({
            "sequence_name": s, "category": "hydrant",
            "viewpoint_quality_score": 0.9,
            "point_cloud": {"path": ply_rel, "quality_score": 0.8,
                            "n_points": 500}})
    with gzip.open(cat / "sequence_annotations.jgz", "wt") as f:
        json.dump(seq_annots, f)
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


def test_depth_png_roundtrip(tmp_path):
    depth = np.abs(np.random.RandomState(0).randn(20, 30)).astype(np.float32)
    depth[3, 4] = np.inf
    p = str(tmp_path / "d.png")
    save_depth_png(p, depth)
    back = load_depth_png(p, scale_adjustment=2.0)
    assert back.shape == (20, 30)
    assert back[3, 4] == 0.0                       # non-finite zeroed
    # float16 storage: exact at f16 resolution after the scale
    finite = np.isfinite(depth)
    np.testing.assert_allclose(back[finite], 2.0 * depth.astype(
        np.float16).astype(np.float32)[finite], rtol=1e-6)


def test_frame_data_depth_and_pointcloud(co3d_root):
    ds = Co3dDataset(co3d_root, category="hydrant", reso=64,
                     load_depths=True, load_depth_masks=True,
                     mask_depths=True, load_point_clouds=True,
                     max_points=100, seed=4)
    fd = ds.frame_data(0)
    assert fd["depth_map"].shape == (64, 64)
    assert fd["depth_mask"].shape == (64, 64)
    # scale_adjustment 0.5 applied: depths were in [2, 2.5] on disk.
    # mask_depths multiplies by the soft fg probability (reference
    # json_index_dataset.py:589-591), so check solid-foreground pixels
    solid = fd["depth_map"][fd["fg"] > 0.999]
    assert solid.min() >= 0.9 and solid.max() <= 1.3
    # and depth is zeroed outside the fg mask
    assert (fd["depth_map"][fd["fg"] == 0] == 0).all()
    assert fd["sequence_category"] == "hydrant"
    assert fd["camera_quality_score"] == pytest.approx(0.9)
    assert fd["point_cloud_quality_score"] == pytest.approx(0.8)
    pcl = fd["sequence_point_cloud"]
    assert pcl["points"].shape == (100, 3)         # max_points subsample
    assert pcl["colors"].shape == (100, 3)
    assert pcl["colors"].min() >= 0 and pcl["colors"].max() <= 1.0


def test_pointcloud_ply_loader(co3d_root):
    pcl = load_pointcloud_ply(
        os.path.join(co3d_root, "hydrant/seq_a/pointcloud.ply"))
    assert pcl["points"].shape == (500, 3)
    assert pcl["colors"].dtype == np.float32


def test_seq_frame_index_and_eval_batches(co3d_root):
    ds = Co3dDataset(co3d_root, category="hydrant", reso=32, seed=5)
    # resolve by (seq, frame_number) and with a consistent path check
    img_path = ds.frames[0]["image"]["path"]
    seq0, f0 = ds.frames[0]["sequence_name"], ds.frames[0]["frame_number"]
    out = ds.seq_frame_index_to_dataset_index([[(seq0, f0, img_path)],
                                               [("seq_b", 2)]])
    assert out[0] == [0]
    assert ds.frames[out[1][0]]["sequence_name"] == "seq_b"
    assert ds.frames[out[1][0]]["frame_number"] == 2
    with pytest.raises(IndexError):
        ds.seq_frame_index_to_dataset_index([[("nope", 0)]])
    with pytest.raises(ValueError):
        ds.seq_frame_index_to_dataset_index([[(seq0, f0, "wrong/path.jpg")]])
    # missing entries: None-filled vs removed
    kept = ds.seq_frame_index_to_dataset_index(
        [[("nope", 0), (seq0, f0)]], allow_missing_indices=True)
    assert kept == [[None, 0]]
    removed = ds.seq_frame_index_to_dataset_index(
        [[("nope", 0), (seq0, f0)]], allow_missing_indices=True,
        remove_missing_indices=True)
    assert removed == [[0]]
    # eval_batch_index resolution at construction
    ds2 = Co3dDataset(co3d_root, category="hydrant", reso=32, seed=5,
                      eval_batch_index=[[(seq0, f0)], [("gone", 1)]])
    assert ds2.eval_batches == [[0], []]
    with pytest.raises(ValueError):
        Co3dDataset(co3d_root, category="hydrant", reso=32,
                    eval_batches=[[0]], eval_batch_index=[[(seq0, f0)]])
