"""Wonder3D 6-view ortho pipeline: fixed poses match the reference's
shipped txt files, the prediction-directory loader parses the real layout,
and the full ortho-NeuS recipe runs end to end on tiny shapes."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from v3d_tpu.data.wonder3d import (
    VIEW_TYPES,
    load_wonder3d_views,
    make_fixed_pose,
    rt_opengl2opencv,
)


def test_fixed_poses_match_reference_files():
    ref_dir = "/root/reference/mesh_recon/datasets/fixed_poses"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference fixed poses unavailable")
    for view in ("front", "front_right", "right", "back", "left",
                 "front_left", "back_left", "back_right"):
        ref = np.loadtxt(os.path.join(ref_dir, f"000_{view}_RT.txt"))
        got = make_fixed_pose(view)
        assert np.abs(ref.reshape(3, 4) - got).max() < 1e-6, view


@pytest.fixture(scope="module")
def wonder3d_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("wonder3d_out")
    obj = root / "owl"
    (obj / "masked_colors").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for view in VIEW_TYPES:
        nrm = rng.randint(0, 255, (32, 32, 4), dtype=np.uint8)
        nrm[..., 3] = 0
        nrm[8:24, 8:24, 3] = 255
        Image.fromarray(nrm, "RGBA").save(obj / f"normals_000_{view}.png")
        rgb = rng.randint(0, 200, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(obj / f"rgb_000_{view}.png")
        mc = np.concatenate([rgb, nrm[..., 3:]], axis=-1)
        Image.fromarray(mc, "RGBA").save(
            obj / "masked_colors" / f"rgb_000_{view}.png")
    return str(root)


def test_loader_shapes_and_masks(wonder3d_dir):
    views = load_wonder3d_views(wonder3d_dir, "owl", im_size=32)
    assert views["images"].shape == (6, 32, 32, 3)
    assert views["normals_world"].shape == (6, 32, 32, 3)
    assert views["masks"].shape == (6, 32, 32)
    assert views["c2ws"].shape == (6, 3, 4)
    np.testing.assert_allclose(views["view_weights"],
                               [1.0, 0.8, 0.2, 1.0, 0.4, 0.7])
    # mask from the normal alpha
    assert views["masks"][0, 16, 16] == 1.0
    assert views["masks"][0, 0, 0] == 0.0
    # normals zeroed outside the mask, in [-1,1] inside
    assert np.all(views["normals_world"][0, 0, 0] == 0.0)
    # w2c -> c2w consistency
    for c2w, w2c in zip(views["c2ws"], views["w2cs"]):
        m = np.eye(4)
        m[:3] = w2c
        np.testing.assert_allclose(np.linalg.inv(m)[:3], c2w, atol=1e-5)


@pytest.mark.slow
def test_ortho_neus_recipe_runs(wonder3d_dir, tmp_path):
    from v3d_tpu.apps.recon_neus_ortho import reconstruct_ortho

    trainer, mesh = reconstruct_ortho(
        wonder3d_dir, "owl", str(tmp_path / "out"), max_steps=3,
        im_size=32, mc_resolution=24, log_every=10)
    assert os.path.exists(tmp_path / "out" / "mesh.obj")
    assert trainer.view_weights is not None
