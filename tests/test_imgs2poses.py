"""imgs2poses CLI: COLMAP orchestration (mesh_recon/scripts/imgs2poses.py).

COLMAP itself isn't installed here; a fake `colmap` shell script on PATH
records its invocations and, on `mapper`, writes a minimal text sparse model —
exercising the full orchestration + the read-back summary.
"""

import os
import stat
import subprocess
import sys

import pytest

from v3d_tpu.apps import imgs2poses

FAKE_COLMAP = r"""#!/bin/bash
echo "$@" >> "$FAKE_LOG"
cmd="$1"; shift
out=""
while [ $# -gt 0 ]; do
  [ "$1" = "--output_path" ] && out="$2"
  shift
done
if [ "$cmd" = "mapper" ]; then
  mkdir -p "$out/0"
  cat > "$out/0/cameras.txt" <<EOF
# Camera list
1 PINHOLE 64 48 50.0 50.0 32.0 24.0
EOF
  cat > "$out/0/images.txt" <<EOF
# Image list
1 1.0 0.0 0.0 0.0 0.1 0.2 0.3 1 frame0.png
0.0 0.0 -1
2 1.0 0.0 0.0 0.0 0.3 0.2 0.1 1 frame1.png
0.0 0.0 -1
EOF
  cat > "$out/0/points3D.txt" <<EOF
# 3D point list
EOF
fi
"""


@pytest.fixture
def fake_colmap(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "colmap"
    exe.write_text(FAKE_COLMAP)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / "calls.log"
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("FAKE_LOG", str(log))
    return log


def _scene(tmp_path):
    from PIL import Image
    import numpy as np

    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    for name in ("frame0.png", "frame1.png"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            scene / "images" / name)
    return scene


def test_gen_poses_runs_colmap_and_loads_model(tmp_path, fake_colmap):
    scene = _scene(tmp_path)
    summary = imgs2poses.gen_poses(str(scene))
    assert summary == {"cameras": 1, "images": 2, "points3d": 0}

    calls = fake_colmap.read_text().strip().splitlines()
    assert len(calls) == 3
    assert calls[0].startswith("feature_extractor")
    assert "--ImageReader.single_camera 1" in calls[0]
    assert calls[1].startswith("exhaustive_matcher")
    assert calls[2].startswith("mapper")
    assert "--Mapper.init_min_tri_angle 4" in calls[2]
    assert os.path.exists(scene / "colmap_output.txt")

    # second run: model present -> colmap NOT re-invoked (imgs2poses.py:58-68)
    imgs2poses.gen_poses(str(scene))
    assert len(fake_colmap.read_text().strip().splitlines()) == 3

    # the produced model feeds the scene loader end-to-end
    from v3d_tpu.data.scene_datasets import load_colmap_scene

    frames = load_colmap_scene(str(scene))
    assert frames.num_frames == 2


def test_missing_binary_is_actionable(tmp_path, monkeypatch):
    scene = _scene(tmp_path)
    monkeypatch.setenv("PATH", str(tmp_path))  # no colmap anywhere
    with pytest.raises(FileNotFoundError, match="COLMAP"):
        imgs2poses.gen_poses(str(scene))


def test_sequential_matcher_flag(tmp_path, fake_colmap):
    scene = _scene(tmp_path)
    rc = subprocess.run(
        [sys.executable, "-m", "v3d_tpu.apps.imgs2poses", str(scene),
         "--match-type", "sequential_matcher"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))})
    assert rc.returncode == 0, rc.stderr
    assert "sequential_matcher" in fake_colmap.read_text()
