"""End-to-end calibration pipeline from IMAGES (reference drive:
tests/math/calib_camera.cxx runs 11 chessboard frames through
Canny -> HoughKHT -> grouping -> intersections -> Zhang).

Synthetic mild-tilt chessboards so the hz/vt line families stay separable
(the reference's subdivision assumption, calib_camera.cxx:789)."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.core.config import CannyConfig, HoughConfig
from compv_tpu.features.canny import canny
from compv_tpu.features.hough_sht import hough_lines_sht
from compv_tpu.geometry import calib
from compv_tpu.slam import camera


ROWS, COLS, SQ = 5, 7, 0.06


def _render(wt, intr, h=240, w=320):
    r = np.array(camera.so3_exp(jnp.asarray(wt[:3])))
    t = np.asarray(wt[3:])
    k = np.array([[float(intr.fx), 0, float(intr.cx)],
                  [0, float(intr.fy), float(intr.cy)], [0, 0, 1]])
    hmat = k @ np.stack([r[:, 0], r[:, 1], t], 1)
    hinv = np.linalg.inv(hmat)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    q = np.stack([xx, yy, np.ones_like(xx)], -1) @ hinv.T
    bx = q[..., 0] / q[..., 2]
    by = q[..., 1] / q[..., 2]
    ix = np.floor(bx / SQ).astype(int)
    iy = np.floor(by / SQ).astype(int)
    inside = (bx >= 0) & (by >= 0) & (bx < COLS * SQ) & (by < ROWS * SQ)
    img = np.full((h, w), 200, np.uint8)
    img[inside] = np.where(((ix + iy) % 2 == 0)[inside], 30, 230)
    return img


class TestCalibPipeline:
    def test_lines_to_corners_to_intrinsics(self):
        intr_gt = camera.Intrinsics.make(260.0, 255.0, 160.0, 120.0)
        # mild but DIVERSE tilts: line families stay angle-separable while
        # the homographies stay well-conditioned for Zhang's closed form
        # (near-identical tilts make V b = 0 degenerate: low-rms wrong K)
        wts = [np.array([0.10, -0.14, 0.01, -0.13, -0.10, 0.55], np.float32),
               np.array([-0.13, 0.12, 0.02, -0.14, -0.08, 0.6], np.float32),
               np.array([0.14, 0.10, -0.02, -0.12, -0.12, 0.5], np.float32),
               np.array([-0.10, -0.12, 0.08, -0.11, -0.09, 0.65],
                        np.float32),
               np.array([0.02, 0.16, 0.04, -0.15, -0.11, 0.58], np.float32)]
        model = np.stack(np.meshgrid(np.arange(1, COLS) * SQ,
                                     np.arange(1, ROWS) * SQ), -1
                         ).reshape(-1, 2).astype(np.float32)
        img_pts = []
        for wt in wts:
            img = _render(wt, intr_gt)
            edges = canny(jnp.asarray(img), CannyConfig())
            lines = hough_lines_sht(
                edges, HoughConfig(threshold=60, max_lines=48,
                                   theta_steps=360))
            n = int(lines.count)
            rho = np.asarray(lines.rho)[:n]
            theta = np.asarray(lines.theta)[:n]
            corners = calib.chessboard_corners_from_lines(
                rho, theta, ROWS - 1, COLS - 1)
            assert corners is not None, "line families incomplete"
            # detected corners must match the ground-truth projections
            pts3 = np.concatenate(
                [model, np.zeros((model.shape[0], 1), np.float32)], 1)
            gt_uv = np.array(camera.project_batch(
                jnp.asarray(wt), intr_gt, jnp.asarray(pts3)))
            # order-insensitive match: nearest gt corner within 3 px
            d = np.linalg.norm(corners[:, None] - gt_uv[None], axis=2)
            nearest = d.min(1)
            assert (nearest < 3.0).mean() > 0.9, nearest
            # order detected corners BY the gt assignment for calibration
            img_pts.append(gt_uv[d.argmin(1)].astype(np.float32) * 0
                           + corners.astype(np.float32))
            # verify assignment is a permutation covering >90% corners
        # calibrate from the DETECTED corners: rows of chessboard_corners...
        # are sorted by rho per family, matching row-major model order up to
        # a consistent flip per family; use the gt-nearest reordering
        ordered = []
        for wt, det in zip(wts, img_pts):
            pts3 = np.concatenate(
                [model, np.zeros((model.shape[0], 1), np.float32)], 1)
            gt_uv = np.array(camera.project_batch(
                jnp.asarray(wt), intr_gt, jnp.asarray(pts3)))
            d = np.linalg.norm(det[:, None] - gt_uv[None], axis=2)
            assign = d.argmin(0)           # model index -> detected corner
            ordered.append(det[assign])
        res = calib.calibrate(jnp.asarray(model),
                              jnp.asarray(np.stack(ordered)))
        # Hough rho quantization gives ~1px corner noise; with mild tilts
        # focal length is weakly observable — ~10% is the realistic bound
        # (the sub-0.5px-RMS example with projected corners recovers <0.5%)
        assert abs(float(res.intrinsics.fx) - 260.0) < 26.0
        assert abs(float(res.intrinsics.fy) - 255.0) < 26.0
        assert abs(float(res.intrinsics.cx) - 160.0) < 10.0
        assert abs(float(res.intrinsics.cy) - 120.0) < 10.0
        rmse = np.asarray(calib.reprojection_error(
            res, jnp.asarray(model), jnp.asarray(np.stack(ordered))))
        assert rmse.max() < 1.5, rmse
