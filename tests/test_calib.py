"""Camera calibration tests on synthetic chessboard views."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compv_tpu.geometry import calib
from compv_tpu.slam import camera


@pytest.fixture(scope="module")
def calib_problem():
    rng = np.random.default_rng(0)
    intr_true = camera.Intrinsics.make(520.0, 510.0, 320.0, 240.0)
    # 9x7 chessboard, 30mm squares
    gx, gy = np.mgrid[0:9, 0:7]
    model = np.stack([gx.reshape(-1) * 0.03, gy.reshape(-1) * 0.03], 1
                     ).astype(np.float32)
    model3 = np.concatenate([model, np.zeros((63, 1), np.float32)], 1)
    poses, obs = [], []
    for p in range(6):
        wt = np.concatenate([
            rng.uniform(-0.25, 0.25, 3),
            [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
             rng.uniform(0.5, 0.9)],
        ]).astype(np.float32)
        uv = np.array(camera.project_batch(jnp.asarray(wt), intr_true,
                                             jnp.asarray(model3)))
        uv += rng.normal(0, 0.2, uv.shape)
        poses.append(wt)
        obs.append(uv)
    return intr_true, model, np.stack(poses), np.stack(obs).astype(np.float32)


class TestZhang:
    def test_intrinsics_recovered(self, calib_problem):
        intr_true, model, gt_poses, obs = calib_problem
        res = calib.calibrate(jnp.asarray(model), jnp.asarray(obs))
        assert abs(float(res.intrinsics.fx) - 520) < 5
        assert abs(float(res.intrinsics.fy) - 510) < 5
        assert abs(float(res.intrinsics.cx) - 320) < 5
        assert abs(float(res.intrinsics.cy) - 240) < 5

    def test_rms_below_noise(self, calib_problem):
        _, model, _, obs = calib_problem
        res = calib.calibrate(jnp.asarray(model), jnp.asarray(obs))
        assert float(res.rms) < 0.5  # noise sigma 0.2/axis

    def test_reprojection_error_per_plane(self, calib_problem):
        _, model, _, obs = calib_problem
        res = calib.calibrate(jnp.asarray(model), jnp.asarray(obs))
        errs = np.asarray(calib.reprojection_error(res, jnp.asarray(model),
                                                   jnp.asarray(obs)))
        assert (errs < 0.6).all()

    def test_distortion_estimated(self):
        """With real k1 in the data, the refine must pick it up."""
        rng = np.random.default_rng(1)
        intr_true = camera.Intrinsics.make(500.0, 500.0, 320.0, 240.0,
                                           k1=-0.2, k2=0.05)
        gx, gy = np.mgrid[0:9, 0:7]
        model = np.stack([gx.reshape(-1) * 0.03, gy.reshape(-1) * 0.03], 1
                         ).astype(np.float32)
        model3 = np.concatenate([model, np.zeros((63, 1), np.float32)], 1)
        obs = []
        for p in range(8):
            wt = np.concatenate([
                rng.uniform(-0.3, 0.3, 3),
                [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                 rng.uniform(0.5, 1.0)],
            ]).astype(np.float32)
            uv = np.array(camera.project_batch(jnp.asarray(wt), intr_true,
                                                 jnp.asarray(model3)))
            obs.append(uv + rng.normal(0, 0.1, uv.shape))
        res = calib.calibrate(jnp.asarray(model),
                              jnp.asarray(np.stack(obs), jnp.float32),
                              refine_iters=80)
        assert abs(float(res.intrinsics.k1) - (-0.2)) < 0.05
        assert float(res.rms) < 0.5

    def test_undistort_maps_identity_when_no_distortion(self):
        intr = camera.Intrinsics.make(500.0, 500.0, 32.0, 24.0)
        mx, my = calib.undistort_maps(intr, 48, 64)
        ys, xs = np.mgrid[0:48, 0:64]
        np.testing.assert_allclose(np.asarray(mx), xs, atol=1e-4)
        np.testing.assert_allclose(np.asarray(my), ys, atol=1e-4)

    def test_build_undistorter_methods_agree(self):
        """The precompiled per-frame undistorter must give the same frame
        for both sampling backends (within 1 u8 level) and match the
        one-shot undistort_image."""
        intr = camera.Intrinsics.make(
            120.0, 120.0, 40.0, 28.0, k1=-0.15, k2=0.02)
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.integers(0, 256, (56, 80), np.uint8))
        one_shot = np.asarray(calib.undistort_image(img, intr))
        for method in ("gather", "bounded"):
            run = calib.build_undistorter(intr, 56, 80, method=method)
            out = np.asarray(run(img))
            assert np.abs(out.astype(int) - one_shot.astype(int)).max() <= 1


class TestChessboardFromLines:
    def test_grid_intersections(self):
        # synthetic line families: 4 vertical (x=10,20,30,40), 3 horizontal
        rho = np.array([10, 20, 30, 40, 15, 25, 35], np.float32)
        theta = np.array([0, 0, 0, 0, np.pi / 2, np.pi / 2, np.pi / 2],
                         np.float32)
        corners = calib.chessboard_corners_from_lines(rho, theta, 3, 4)
        assert corners.shape == (12, 2)
        np.testing.assert_allclose(corners[0], [10, 15], atol=1e-5)
        np.testing.assert_allclose(corners[-1], [40, 35], atol=1e-5)

    def test_incomplete_families_return_none(self):
        rho = np.array([10, 20], np.float32)
        theta = np.array([0, 0], np.float32)
        assert calib.chessboard_corners_from_lines(rho, theta, 3, 4) is None
