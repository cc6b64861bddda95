"""GObjaverse real-layout loader tests: a tiny synthetic archive is written
in the exact directory/file structure of the original
(sgm/data/objaverse.py:188-424) and loaded end to end."""

import json
import os

import numpy as np
import pytest

from v3d_tpu.data.gobjaverse import (
    N_VIEWS,
    GObjaverse,
    build_camera_standard,
    calc_elevation,
    normalize_poses,
    read_camera_intrinsics_single,
    read_camera_matrix_single,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    root = tmp_path_factory.mktemp("gobjaverse_root")
    ids = ["0/10010", "0/10011", "5/99999"]
    rng = np.random.RandomState(0)
    (root / "latents256").mkdir()
    (root / "clip_emb256").mkdir()
    for oid in ids:
        for v in range(N_VIEWS):
            d = root / "gobjaverse" / oid / f"{v:05d}"
            d.mkdir(parents=True)
            rgba = rng.randint(0, 255, (32, 32, 4), dtype=np.uint8)
            rgba[..., 3] = (rgba[..., 3] > 64) * 255
            Image.fromarray(rgba, "RGBA").save(d / f"{v:05d}.png")
            az = 2 * np.pi * v / N_VIEWS
            origin = [2 * np.cos(az), 2 * np.sin(az), 0.3]
            z = -np.asarray(origin) / np.linalg.norm(origin)
            x = np.cross([0, 0, 1.0], z)
            x = x / np.linalg.norm(x)
            y = np.cross(z, x)
            meta = {"x": x.tolist(), "y": y.tolist(), "z": z.tolist(),
                    "origin": origin,
                    "x_fov": 0.6911, "y_fov": 0.6911,
                    "bbox": [[-0.5] * 3, [0.5] * 3]}
            with open(d / f"{v:05d}.json", "w") as f:
                json.dump(meta, f)
        safe = oid  # ids contain '/', latents files are stored flat
        os.makedirs(os.path.dirname(root / "latents256" / safe), exist_ok=True)
        os.makedirs(os.path.dirname(root / "clip_emb256" / safe), exist_ok=True)
        np.save(str(root / "latents256" / safe) + ".npy",
                rng.randn(N_VIEWS, 4, 32, 32).astype(np.float32))
        np.save(str(root / "clip_emb256" / safe) + ".npy",
                rng.randn(N_VIEWS, 1, 1024).astype(np.float32))
    with open(root / "valid_uids.json", "w") as f:
        json.dump(ids, f)
    np.savez(root / "clip_score_per_view.npz",
             **{oid: rng.rand(N_VIEWS).astype(np.float32) for oid in ids})
    with open(root / "text_captions_cap3d.json", "w") as f:
        json.dump({oid: f"a toy {i}" for i, oid in enumerate(ids)}, f)
    return str(root)


def test_frames_item_fields(archive):
    ds = GObjaverse(archive, reso=32, load_caps=True, seed=1)
    assert len(ds) == 3
    item = ds[0]
    assert item["frames"].shape == (N_VIEWS, 32, 32, 3)
    assert item["frames"].min() >= -1.0 and item["frames"].max() <= 1.0
    assert item["cond_frames"].shape == (32, 32, 3)
    np.testing.assert_array_equal(item["cond_frames_without_noise"],
                                  item["frames"][0])
    assert item["cond_aug"].shape == (N_VIEWS,)
    assert item["num_video_frames"] == N_VIEWS
    assert item["motion_bucket_id"][0] == 300.0
    assert isinstance(item["caption"], str)


def test_latents_mode(archive):
    ds = GObjaverse(archive, use_latents=True, seed=2)
    item = ds[1]
    assert item["latents"].shape == (N_VIEWS, 32, 32, 4)  # moved to NHWC
    assert item["cond_frames_without_noise"].shape == (1, 1024)
    assert item["cond_frames"].shape == (32, 32, 4)


def test_front_view_selection(archive):
    fixed = GObjaverse(archive, front_view_selection="fixed", seed=3)
    i1, i2 = fixed[0], fixed[0]
    np.testing.assert_array_equal(i1["frames"], i2["frames"])

    cmax = GObjaverse(archive, front_view_selection="clip_score_max", seed=3)
    assert sorted(cmax.ids) == sorted(fixed.ids)
    j1, j2 = cmax[0], cmax[0]
    np.testing.assert_array_equal(j1["frames"], j2["frames"])  # argmax stable

    rnd = GObjaverse(archive, front_view_selection="random", seed=4)
    rolled = [rnd[0]["frames"][0] for _ in range(6)]
    assert any(not np.array_equal(rolled[0], r) for r in rolled[1:])

    soft = GObjaverse(archive, front_view_selection="clip_score_softmax",
                      seed=5)
    _ = soft[0]


def test_pixelnerf_cameras_and_collate(archive):
    ds = GObjaverse(archive, reso=32, load_pixelnerf=True, scale_pose=True,
                    max_n_cond=3, condition_on_elevation=True, seed=6)
    batch = ds.collate_fn([ds[0], ds[1]])
    pn = batch["pixelnerf_input"]
    assert pn["cameras"].shape == (2, N_VIEWS, 25)
    assert pn["rgb"].shape == (2 * N_VIEWS, 32, 32, 3)
    assert batch["frames"].shape == (2 * N_VIEWS, 32, 32, 3)
    assert batch["elevation"].shape == (2 * N_VIEWS,)
    assert batch["image_only_indicator"].shape == (2, N_VIEWS)
    # scale_pose: farthest camera at radius 1.5 around the mean center
    c2ws = pn["cameras"][0, :, :16].reshape(N_VIEWS, 4, 4)
    center = c2ws[:, :3, 3].mean(axis=0)
    r = np.linalg.norm(c2ws[:, :3, 3] - center, axis=-1).max()
    assert r == pytest.approx(1.5, rel=1e-5)
    # multi-cond sampling (max_n_cond=3): source 0 always included
    if "source_index" in pn:
        assert pn["source_index"].shape == (2, 3)
        assert (pn["source_index"][:, 0] == 0).all()
        assert pn["source_images"].shape[1] == 3


def test_camera_helpers(archive):
    meta = os.path.join(archive, "gobjaverse", "0/10010", "00003",
                        "00003.json")
    c2w = read_camera_matrix_single(meta)
    assert c2w.shape == (3, 4)
    # columns orthonormal after the y/z sign flips
    rot = c2w[:, :3]
    np.testing.assert_allclose(rot.T @ rot, np.eye(3), atol=1e-5)
    intr = read_camera_intrinsics_single(meta, 256, 256)
    assert intr.shape == (3, 2)
    assert intr[2, 0] == 256
    cams = build_camera_standard(c2w[None], intr[None])
    assert cams.shape == (1, 25)
    assert cams[0, 24] == 1.0  # intrinsics bottom-right
    elev = calc_elevation(np.concatenate(
        [c2w, np.asarray([[0, 0, 0, 1.0]], np.float32)])[None])
    assert np.isfinite(elev).all()
    normed = normalize_poses(np.tile(cams, (4, 1)))
    assert normed.shape == (4, 25)


def test_corrupt_item_falls_back(archive):
    ds = GObjaverse(archive, reso=32, front_view_selection="fixed", seed=7)
    # break object 2's files by pointing at a missing id
    ds.ids[2] = "0/does_not_exist"
    item = ds[2]
    np.testing.assert_array_equal(item["frames"], ds[0]["frames"])


def test_real_format_builds_training_cond(archive):
    """Fast half of the end-to-end check: real-layout archive (latents mode)
    -> collate -> engine.training_cond.  The train-step compile lives in the
    slow-marked test below; the format plumbing is identical."""
    import jax

    from v3d_tpu.engines.builder import build_tiny_engine

    ds = GObjaverse(archive, use_latents=True, seed=0)
    batch = ds.collate_fn([ds[0]])
    t = 8
    for k, v in list(batch.items()):
        if isinstance(v, np.ndarray) and v.shape[:1] == (N_VIEWS,):
            batch[k] = v[:t]
        elif isinstance(v, np.ndarray) and v.ndim >= 2 \
                and v.shape[1] == N_VIEWS:
            batch[k] = v[:, :t]
    if "image_only_indicator" in batch:
        batch["image_only_indicator"] = batch["image_only_indicator"][:, :t]
    batch["latents"] = batch["latents"][:, :8, :8]
    batch["cond_frames"] = batch["cond_frames"][..., :8, :8, :]
    batch["cond_frames_without_noise"] = \
        batch["cond_frames_without_noise"][..., :64]

    engine = build_tiny_engine(num_frames=t, resolution=64)
    cond = engine.training_cond(batch, num_frames=t)
    for v in jax.tree_util.tree_leaves(cond):
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.slow
def test_real_format_feeds_training_step(archive):
    """End-to-end: the real-layout archive (latents mode) -> collate ->
    engine.training_cond -> one DiffusionTrainer step.  Closes the
    'launcher has nothing real to train on' gap from round 1.  Slow: the
    train-step compile alone is minutes on this single-CPU box."""
    import jax
    import jax.numpy as jnp

    from v3d_tpu.engines.builder import build_tiny_engine, init_engine_params
    from v3d_tpu.engines.trainer import DiffusionTrainer, TrainConfig
    from v3d_tpu.parallel.mesh import make_mesh

    ds = GObjaverse(archive, use_latents=True, seed=0)
    batch = ds.collate_fn([ds[0]])
    # subsample the 24-view orbit to 8 frames (the DP mesh shards frames
    # over 8 virtual devices) and crop the 32x32 latents to 8x8 — the full
    # shapes pushed this single test's CPU train-step compile past 15 min;
    # the format plumbing being tested is identical
    t = 8
    for k, v in list(batch.items()):
        if isinstance(v, np.ndarray) and v.shape[:1] == (N_VIEWS,):
            batch[k] = v[:t]
        elif isinstance(v, np.ndarray) and v.ndim >= 2 \
                and v.shape[1] == N_VIEWS:
            batch[k] = v[:, :t]
    if "image_only_indicator" in batch:
        batch["image_only_indicator"] = batch["image_only_indicator"][:, :t]
    batch["latents"] = batch["latents"][:, :8, :8]
    batch["cond_frames"] = batch["cond_frames"][..., :8, :8, :]

    engine = build_tiny_engine(num_frames=t, resolution=64)
    params = init_engine_params(engine, jax.random.PRNGKey(0), 64, 64)
    # tiny engine context dim is 64; slice the real 1024-dim CLIP embedding
    batch["cond_frames_without_noise"] = \
        batch["cond_frames_without_noise"][..., :64]
    cond = engine.training_cond(batch, num_frames=t)

    trainer = DiffusionTrainer(engine, params["unet"],
                               TrainConfig(base_learning_rate=1e-4,
                                           log_every=1),
                               mesh=make_mesh(model=1), num_frames=t)
    b = trainer.shard_batch({"latents": batch["latents"], "cond": cond})
    stats = trainer.train_step(jax.random.PRNGKey(0), b["latents"],
                               b["cond"])
    assert np.isfinite(float(stats["loss"]))
    assert trainer.step == 1
