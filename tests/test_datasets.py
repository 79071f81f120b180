"""Dataset loader tests (TUM / KITTI formats, association, synthetic)."""
import numpy as np
import pytest

from compv_tpu.io import datasets


class TestTUM:
    def test_trajectory_parse(self, tmp_path):
        p = tmp_path / "groundtruth.txt"
        p.write_text("# ground truth\n"
                     "# ts tx ty tz qx qy qz qw\n"
                     "100.0 1.0 2.0 3.0 0 0 0 1\n"
                     "100.1 1.1 2.1 3.1 0 0 0 1\n")
        ts, pos = datasets.load_tum_trajectory(str(p))
        np.testing.assert_allclose(ts, [100.0, 100.1])
        np.testing.assert_allclose(pos[1], [1.1, 2.1, 3.1])

    def test_rgb_list(self, tmp_path):
        (tmp_path / "rgb.txt").write_text(
            "# color images\n100.0 rgb/100.0.png\n100.05 rgb/100.05.png\n")
        ts, paths = datasets.load_tum_rgb_list(str(tmp_path))
        assert len(paths) == 2
        assert paths[0].endswith("rgb/100.0.png")
        np.testing.assert_allclose(ts, [100.0, 100.05])

    def test_associate(self):
        a = np.array([0.0, 1.0, 2.0])
        b = np.array([0.011, 0.995, 5.0])
        pairs = datasets.associate(a, b, max_dt=0.02)
        assert pairs == [(0, 0), (1, 1)]


class TestKITTI:
    def test_poses_parse(self, tmp_path):
        p = tmp_path / "00.txt"
        rows = []
        for i in range(3):
            m = np.hstack([np.eye(3), [[i], [0], [2.0 * i]]]).reshape(-1)
            rows.append(" ".join(f"{v:.6e}" for v in m))
        p.write_text("\n".join(rows))
        pos = datasets.load_kitti_poses(str(p))
        np.testing.assert_allclose(pos[:, 0], [0, 1, 2])
        np.testing.assert_allclose(pos[:, 2], [0, 2, 4])


class TestSynthetic:
    def test_sequence_shapes(self):
        frames, gt, (fx, fy, cx, cy) = datasets.synthetic_sequence(
            n_frames=4, h=120, w=160, n_landmarks=100)
        assert len(frames) == 4 and frames[0].shape == (120, 160)
        assert gt.shape == (4, 3)
        assert frames[0].dtype == np.uint8
        # motion: camera center moves between frames
        assert np.linalg.norm(gt[1] - gt[0]) > 0
