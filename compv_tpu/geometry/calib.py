"""Camera calibration: Zhang's method on planar (chessboard) targets.

Re-design of core/calib/compv_core_calib_camera.cxx:127-1283:
  reference: Canny -> HoughKHT -> line grouping -> intersections -> per-plane
  homography -> intrinsics from Vb=0 (:479-574) -> extrinsics (:589-643) ->
  radial-distortion LSQ (:657+) -> global LM refine (:1030-1170).

This module takes correspondences (model plane points + per-image observed
corners) and runs the math pipeline; corner detection from lines lives in
`chessboard_corners_from_lines`. Every solve is the batched-Jacobi /
autodiff-LM machinery — no vendored lmfit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..slam.camera import Intrinsics, project_batch, so3_log
from . import linalg
from .homography import compute_h
from .lm import levenberg_marquardt


class CalibResult(NamedTuple):
    intrinsics: Intrinsics
    poses: jax.Array      # (P, 6) per-plane extrinsics (world->cam)
    rms: jax.Array        # reprojection RMSE in pixels


def _v_row(h: jax.Array, i: int, j: int) -> jax.Array:
    """Zhang's v_ij from homography columns (calib_camera.cxx:489-527)."""
    return jnp.stack([
        h[0, i] * h[0, j],
        h[0, i] * h[1, j] + h[1, i] * h[0, j],
        h[1, i] * h[1, j],
        h[2, i] * h[0, j] + h[0, i] * h[2, j],
        h[2, i] * h[1, j] + h[1, i] * h[2, j],
        h[2, i] * h[2, j],
    ])


def intrinsics_from_homographies(hs: jax.Array) -> Intrinsics:
    """(P, 3, 3) plane homographies -> K via Vb = 0 (min eigenvector of VᵗV,
    Zhang closed form — calib_camera.cxx:529-574)."""
    def rows(h):
        return jnp.stack([_v_row(h, 0, 1), _v_row(h, 0, 0) - _v_row(h, 1, 1)])

    v = jax.vmap(rows)(hs).reshape(-1, 6)
    b = linalg.min_eigenvector(v.T @ v, sweeps=14)
    b11, b12, b22, b13, b23, b33 = b
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = jnp.sqrt(jnp.abs(lam / b11))
    fy = jnp.sqrt(jnp.abs(lam * b11 / (b11 * b22 - b12 * b12)))
    # zero-skew model (the reference also drops skew)
    cx = -b13 * fx * fx / lam
    return Intrinsics(fx=fx, fy=fy, cx=cx, cy=cy,
                      k1=jnp.float32(0.0), k2=jnp.float32(0.0))


def extrinsics_from_homography(k: Intrinsics, h: jax.Array) -> jax.Array:
    """Per-plane [R|t] from H = K [r1 r2 t] (calib_camera.cxx:589-643),
    with SVD re-orthonormalization of R. Returns (6,) pose."""
    kinv = linalg.inv3x3(k.matrix())
    a = kinv @ h
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(a[:, 0]), 1e-12)
    # sign: keep the target in front of the camera (t_z > 0)
    lam = lam * jnp.where(a[2, 2] * lam < 0, -1.0, 1.0)
    r1 = a[:, 0] * lam
    r2 = a[:, 1] * lam
    r3 = jnp.cross(r1, r2)
    r = jnp.stack([r1, r2, r3], axis=1)
    # nearest rotation via SVD of R
    u, _, vt = linalg.svd_via_ata(r, sweeps=14)
    r_ortho = u @ vt
    det = jnp.linalg.det(r_ortho)
    r_ortho = r_ortho * jnp.where(det < 0, -1.0, 1.0)
    t = a[:, 2] * lam
    return jnp.concatenate([so3_log(r_ortho), t])


def _pack(intr: Intrinsics, poses: jax.Array) -> jax.Array:
    return jnp.concatenate([
        jnp.stack([intr.fx, intr.fy, intr.cx, intr.cy, intr.k1, intr.k2]),
        poses.reshape(-1)])


def _unpack(params: jax.Array, n_planes: int):
    intr = Intrinsics(fx=params[0], fy=params[1], cx=params[2], cy=params[3],
                      k1=params[4], k2=params[5])
    return intr, params[6:].reshape(n_planes, 6)


@functools.partial(jax.jit, static_argnames=("refine_iters",))
def calibrate(model_pts: jax.Array, image_pts: jax.Array,
              refine_iters: int = 40) -> CalibResult:
    """Zhang calibration.

    model_pts: (N, 2) planar target points (z = 0 plane, e.g. chessboard
               corners in world units).
    image_pts: (P, N, 2) observed pixels per image.
    """
    n_planes = image_pts.shape[0]
    model3 = jnp.concatenate(
        [model_pts, jnp.zeros((model_pts.shape[0], 1), model_pts.dtype)], 1)

    hs = jax.vmap(lambda obs: compute_h(model_pts, obs))(image_pts)
    intr0 = intrinsics_from_homographies(hs)
    poses0 = jax.vmap(lambda h: extrinsics_from_homography(intr0, h))(hs)

    def residual(params):
        intr, poses = _unpack(params, n_planes)
        def per_plane(wt, obs):
            return (project_batch(wt, intr, model3) - obs).reshape(-1)
        return jax.vmap(per_plane)(poses, image_pts).reshape(-1)

    res = levenberg_marquardt(residual, _pack(intr0, poses0),
                              max_iters=refine_iters)
    intr, poses = _unpack(res.params, n_planes)
    n_obs = image_pts.shape[0] * image_pts.shape[1]
    rms = jnp.sqrt(2.0 * res.cost / n_obs)
    return CalibResult(intrinsics=intr, poses=poses, rms=rms)


def reprojection_error(result: CalibResult, model_pts: jax.Array,
                       image_pts: jax.Array) -> jax.Array:
    """Per-plane RMSE (reference proj2DError, calib_utils.cxx:29-491)."""
    model3 = jnp.concatenate(
        [model_pts, jnp.zeros((model_pts.shape[0], 1), model_pts.dtype)], 1)

    def per_plane(wt, obs):
        d = project_batch(wt, result.intrinsics, model3) - obs
        return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=1)))

    return jax.vmap(per_plane)(result.poses, image_pts)


def undistort_maps(intr: Intrinsics, h: int, w: int):
    """Remap grids (map_x, map_y) that undo radial distortion (reference
    initUndistMap, calib_utils.cxx): for each undistorted output pixel,
    the distorted source coordinate."""
    ys, xs = jnp.mgrid[0:h, 0:w]
    xn = (xs.astype(jnp.float32) - intr.cx) / intr.fx
    yn = (ys.astype(jnp.float32) - intr.cy) / intr.fy
    r2 = xn * xn + yn * yn
    d = 1.0 + intr.k1 * r2 + intr.k2 * r2 * r2
    return intr.fx * xn * d + intr.cx, intr.fy * yn * d + intr.cy


def undistort_image(img: jax.Array, intr: Intrinsics) -> jax.Array:
    """Undistort an image with the radial model (reference undist2DImage,
    calib_utils.cxx): undistortion maps + bilinear remap."""
    from ..ops.remap import remap
    h, w = img.shape[:2]
    map_x, map_y = undistort_maps(intr, h, w)
    return remap(img, map_x, map_y)


def build_undistorter(intr: Intrinsics, h: int, w: int,
                      method: str = "auto"):
    """Precompute the undistortion maps ONCE and return a jitted
    per-frame closure — the production per-frame path (the reference
    likewise splits initUndistMap from undist2DImage).

    method: "gather" (ops.remap.remap), "bounded" (ops.remap.remap_bounded
    — tiled MXU sampling, needs the map's displacement bound, computed
    here from the maps), or "auto" (bounded on TPU, gather elsewhere)."""
    from ..kernels.dispatch import on_tpu
    from ..ops import remap as remap_mod
    map_x, map_y = undistort_maps(intr, h, w)
    if method == "auto":
        method = "bounded" if on_tpu() else "gather"
    # maps ride as ARGUMENTS, never as jit-closure captures: a captured
    # eagerly-created device array permanently poisons axon dispatch
    # (CLAUDE.md gotcha #1) and becomes an XLA compile-time constant
    if method == "bounded":
        ys, xs = np.mgrid[0:h, 0:w]
        dmax = int(np.ceil(max(
            np.abs(np.asarray(map_x) - xs).max(),
            np.abs(np.asarray(map_y) - ys).max()))) + 1

        def run(img):
            return remap_mod.remap_bounded(img, map_x, map_y,
                                           max_displacement=dmax)
        return run

    jitted = jax.jit(lambda im, mx, my: remap_mod.remap(im, mx, my))

    def run(img):
        return jitted(img, map_x, map_y)
    return run


def chessboard_corners_from_lines(rho: np.ndarray, theta: np.ndarray,
                                  n_rows: int, n_cols: int):
    """Host-side helper: group Hough lines into two orthogonal families by
    angle, keep the strongest n_rows/n_cols by rho order, intersect ->
    (n_rows * n_cols, 2) corner grid (reference subdivision/grouping,
    calib_camera.cxx:789-1004). Returns None when families are incomplete."""
    theta = np.asarray(theta) % np.pi
    rho = np.asarray(rho, np.float64).copy()
    fam_a = np.abs(np.sin(theta)) < 0.5           # near-vertical lines
    fam_b = ~fam_a
    # canonicalize the vertical family across the theta = pi wrap:
    # (rho, theta ~ pi) is the same line as (-rho, theta - pi)
    theta = theta.copy()
    wrap = fam_a & (theta > np.pi / 2)
    rho[wrap] = -rho[wrap]
    theta[wrap] -= np.pi
    if fam_a.sum() < n_cols or fam_b.sum() < n_rows:
        return None

    def pick(mask, n):
        """Merge near-duplicate detections by rho, then keep the n INTERIOR
        lines: a chessboard yields n+2 lines per family (n inner edges + 2
        board boundaries, calib_camera.cxx grouping drops the borders)."""
        r = np.asarray(rho)[mask]
        t = theta[mask]
        order = np.argsort(r)
        r, t = r[order], t[order]
        gaps = np.diff(r)
        if gaps.size:
            # expected line spacing from the family span over n+2 lines;
            # duplicate detections sit well below half of it
            spacing = (r[-1] - r[0]) / max(n + 1, 1)
            keep = np.concatenate([[True], gaps > 0.5 * spacing])
            # average merged clusters
            cl = np.cumsum(keep) - 1
            r = np.asarray([r[cl == i].mean() for i in range(cl[-1] + 1)])
            t = np.asarray([t[cl == i].mean() for i in range(cl[-1] + 1)])
        if r.size == n + 2:
            return r[1:-1], t[1:-1]
        if r.size == n:
            return r, t
        if r.size < n:
            return None, None
        # ambiguous extra lines: take the most evenly spaced n-window
        best, best_var = 0, np.inf
        for s in range(r.size - n + 1):
            v = np.var(np.diff(r[s:s + n]))
            if v < best_var:
                best, best_var = s, v
        return r[best:best + n], t[best:best + n]

    ra, ta = pick(fam_a, n_cols)
    rb, tb = pick(fam_b, n_rows)
    if ra is None or rb is None:
        return None
    corners = np.zeros((n_rows, n_cols, 2), np.float32)
    for i in range(n_rows):
        for j in range(n_cols):
            a = np.array([[np.cos(ta[j]), np.sin(ta[j])],
                          [np.cos(tb[i]), np.sin(tb[i])]])
            b = np.array([ra[j], rb[i]])
            corners[i, j] = np.linalg.solve(a, b)
    return corners.reshape(-1, 2)
