"""End-to-end KITTI-format dataset path (BASELINE north-star names KITTI
00 alongside TUM fr1): no KITTI data ships in this image, so this test
SYNTHESIZES a sequence directory in the standard KITTI odometry layout
(image_0/ PNG frames + calib.txt P0 row + poses.txt 3x4 rows) from the
ray-cast renderer and runs the example's run_kitti() driver over it
unchanged — proving the whole dataset path (calib parsing, frame listing,
pose file, tracking, scale-aligned ATE) works so a real KITTI sequence
runs identically when data exists.
"""
import os
import sys

import numpy as np

from compv_tpu.io import datasets, image as image_io

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from tests.test_vo_long import _cfg  # reuse the compiled-config shapes


def _write_kitti_dir(root, frames, gt_pos, intr):
    os.makedirs(os.path.join(root, "image_0"))
    fx, fy, cx, cy = intr
    with open(os.path.join(root, "calib.txt"), "w") as f:
        # P0: 3x4 projection, row-major
        f.write(f"P0: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n")
    pose_lines = []
    for i, (img, p) in enumerate(zip(frames, gt_pos)):
        image_io.imwrite(os.path.join(root, "image_0", f"{i:06d}.png"), img)
        # identity rotation + gt position in the translation column
        pose_lines.append(
            f"1 0 0 {p[0]:.6f} 0 1 0 {p[1]:.6f} 0 0 1 {p[2]:.6f}")
    with open(os.path.join(root, "poses.txt"), "w") as f:
        f.write("\n".join(pose_lines) + "\n")


def test_kitti_calib_parse(tmp_path):
    with open(tmp_path / "calib.txt", "w") as f:
        f.write("P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n"
                "P1: 1 0 2 0 0 3 4 0 0 0 1 0\n")
    fx, fy, cx, cy = datasets.load_kitti_calib(str(tmp_path))
    assert (fx, fy) == (718.856, 718.856)
    assert (cx, cy) == (607.1928, 185.2157)
    fx1, fy1, cx1, cy1 = datasets.load_kitti_calib(str(tmp_path), cam=1)
    assert (fx1, fy1, cx1, cy1) == (1.0, 3.0, 2.0, 4.0)


def test_kitti_directory_end_to_end(tmp_path, monkeypatch):
    n = 40
    frames, gt_pos, _, intr = datasets.render_trajectory_sequence(
        n_frames=n, h=160, w=224, seed=5, turn=(0, 0, 0.0))
    seq = str(tmp_path / "00_synth")
    _write_kitti_dir(seq, frames, gt_pos, intr)

    import visual_odometry as vo_example
    monkeypatch.chdir(tmp_path)          # trajectory.png lands in tmp
    err = vo_example.run_kitti(seq, n_frames=n, config=_cfg())

    path_len = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum()
    assert err is not None and err < 0.05 * path_len, (err, path_len)
    assert os.path.exists(tmp_path / "trajectory.png")


def test_kitti_00_real_data(real_data_dir, tmp_path, monkeypatch):
    """Scale-aligned ATE on the first 300 frames of real KITTI 00
    (opt-in: pytest --real-data after tools/fetch_datasets.sh puts
    sequences/00 + poses/00.txt under data/kitti_odometry)."""
    import pytest
    root = os.path.join(real_data_dir, "kitti_odometry")
    seq = os.path.join(root, "sequences", "00")
    poses = os.path.join(root, "poses", "00.txt")
    if not os.path.isdir(seq):
        pytest.skip(f"KITTI 00 not found at {seq} "
                    "(see tools/fetch_datasets.sh)")
    import visual_odometry as vo_example
    monkeypatch.chdir(tmp_path)
    err = vo_example.run_kitti(
        seq, n_frames=300,
        poses_path=poses if os.path.exists(poses) else None)
    # monocular VO, scale-aligned: allow 2% of the ~250 m travelled
    assert err is None or err < 5.0, err
