"""Homography estimation: normalized DLT + vectorized RANSAC.

Re-design of CompVHomography<T>::find (core/calib/compv_core_calib_homography.
cxx:60-555): per-thread serial 4-point RANSAC becomes batched hypothesis
scoring (geometry/ransac.py); computeH keeps the reference's exact algebra:
Hartley-normalize both point sets -> build the 2Nx9 DLT matrix
(buildHomographyEqMatrix, compv_math_matrix.cxx:1010-1058) -> S = AᵗA ->
min-eigenvector by Jacobi -> denormalize -> scale h22 = 1. Inliers are
counted with the symmetric transfer error (H and H⁻¹ MSE, homography.cxx:
498-551).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import RansacConfig
from ..ops.mathutils import normalize2d_hartley
from . import linalg, ransac as ransac_mod
from .transform import perspective2d


def build_dlt_matrix(src: jax.Array, dst: jax.Array) -> jax.Array:
    """(N,2),(N,2) -> (2N, 9) DLT equation matrix (reference
    buildHomographyEqMatrix row layout)."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=1)
    rows2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=1)
    return jnp.concatenate([rows1, rows2], axis=0)


def compute_h(src: jax.Array, dst: jax.Array, valid=None,
              sweeps: int = 10) -> jax.Array:
    """DLT homography from (N>=4) correspondences, Hartley-normalized.
    Padded rows masked via `valid` contribute zero rows. Returns (3,3) with
    h22 = 1."""
    t1, src_n = normalize2d_hartley(src, valid)
    t2, dst_n = normalize2d_hartley(dst, valid)
    a = build_dlt_matrix(src_n, dst_n)
    if valid is not None:
        w = jnp.concatenate([valid, valid]).astype(a.dtype)
        a = a * w[:, None]
    s = a.T @ a                                  # (9, 9)
    h_vec = linalg.min_eigenvector(s, sweeps=sweeps)
    hn = h_vec.reshape(3, 3)
    # denormalize: H = T2^-1 Hn T1
    h = linalg.inv3x3(t2) @ hn @ t1
    scale = h[2, 2]
    h = h / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return h


def symmetric_transfer_error(h: jax.Array, src: jax.Array,
                             dst: jax.Array) -> jax.Array:
    """(N,) forward + backward squared transfer error (reference
    countInliers homography.cxx:498-551 computes MSE under H and H⁻¹)."""
    h_inv = linalg.inv3x3(h)
    fwd = perspective2d(src, h) - dst
    bwd = perspective2d(dst, h_inv) - src
    return jnp.sum(fwd * fwd, axis=1) + jnp.sum(bwd * bwd, axis=1)


def _colinear4(p: jax.Array) -> jax.Array:
    """True if any 3 of 4 points are (near-)colinear — the reference rejects
    such minimal sets (homography.cxx:268-280)."""
    def tri_area(a, b, c):
        return jnp.abs((b[0] - a[0]) * (c[1] - a[1])
                       - (b[1] - a[1]) * (c[0] - a[0]))
    combos = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    areas = jnp.stack([tri_area(p[i], p[j], p[k]) for i, j, k in combos])
    return jnp.any(areas < 1e-3)


class HomographyResult(NamedTuple):
    h: jax.Array             # (3, 3)
    inlier_mask: jax.Array   # (N,) bool
    num_inliers: jax.Array   # () int32


@functools.partial(jax.jit, static_argnames=("config",))
def find_homography(key: jax.Array, src: jax.Array, dst: jax.Array,
                    valid_mask: jax.Array = None,
                    config: RansacConfig = RansacConfig()) -> HomographyResult:
    """RANSAC homography (reference CompVHomography::find): batched 4-point
    hypotheses, symmetric-transfer inlier test, final DLT refit on inliers."""
    data = jnp.concatenate([src, dst], axis=1).astype(jnp.float32)  # (N, 4)

    def build_model(subset):
        s = subset[:, :2]
        d = subset[:, 2:]
        h = compute_h(s, d)
        bad = _colinear4(s) | _colinear4(d) | jnp.any(~jnp.isfinite(h))
        return jnp.where(bad, jnp.full((3, 3), jnp.nan, h.dtype), h)

    def residuals(h, alldata):
        return symmetric_transfer_error(h, alldata[:, :2], alldata[:, 2:])

    res = ransac_mod.ransac(key, data, build_model, residuals,
                            sample_size=4, config=config,
                            valid_mask=valid_mask)
    # final refit on all inliers (reference homography.cxx:182)
    h_refit = compute_h(src.astype(jnp.float32), dst.astype(jnp.float32),
                        valid=res.inlier_mask)
    ok = jnp.all(jnp.isfinite(h_refit)) & (res.num_inliers >= 4)
    h_final = jnp.where(ok, h_refit, res.model)
    return HomographyResult(h=h_final, inlier_mask=res.inlier_mask,
                            num_inliers=res.num_inliers)
