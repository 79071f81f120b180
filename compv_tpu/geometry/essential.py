"""Essential-matrix estimation and decomposition (two-view initialization).

Beyond-reference subsystem (the reference's geometry stops at homographies;
SURVEY §7 step 5 adds the SLAM frontend): normalized 8-point algorithm over
batched RANSAC hypotheses (same engine as homography), Sampson-error inlier
scoring, rank-2 projection, and the 4-way (R, t) disambiguation by cheirality
(vectorized triangulation depth voting).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import RansacConfig
from ..slam.camera import Intrinsics
from . import linalg, ransac as ransac_mod


def _normalize_pixels(uv: jax.Array, intr: Intrinsics) -> jax.Array:
    """Pixels -> normalized camera coordinates."""
    x = (uv[:, 0] - intr.cx) / intr.fx
    y = (uv[:, 1] - intr.cy) / intr.fy
    return jnp.stack([x, y], 1)


def build_epipolar_matrix(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """(N, 9) rows [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1] for x2ᵀEx1=0."""
    a, b = x1[:, 0], x1[:, 1]
    c, d = x2[:, 0], x2[:, 1]
    one = jnp.ones_like(a)
    return jnp.stack([c * a, c * b, c, d * a, d * b, d, a, b, one], 1)


def compute_e(x1: jax.Array, x2: jax.Array, valid=None) -> jax.Array:
    """Essential matrix from >= 8 normalized correspondences: min eigenvector
    of AᵗA, then rank-2 + equal-singular-value projection."""
    rows = build_epipolar_matrix(x1, x2)
    if valid is not None:
        rows = rows * valid.astype(rows.dtype)[:, None]
    s = rows.T @ rows
    e = linalg.min_eigenvector(s, sweeps=12).reshape(3, 3)
    # project to essential manifold: singular values (1, 1, 0)
    u, sv, vt = linalg.svd3x3(e, sweeps=14)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], e.dtype)) @ vt


def sampson_error(e: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """(N,) squared Sampson distance."""
    x1h = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1), x1.dtype)], 1)
    x2h = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1), x2.dtype)], 1)
    ex1 = x1h @ e.T          # (N, 3)
    etx2 = x2h @ e           # (N, 3)
    num = jnp.sum(x2h * ex1, axis=1) ** 2
    den = ex1[:, 0] ** 2 + ex1[:, 1] ** 2 + etx2[:, 0] ** 2 + etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


class EssentialResult(NamedTuple):
    e: jax.Array
    inlier_mask: jax.Array
    num_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("config",))
def find_essential(key: jax.Array, uv1: jax.Array, uv2: jax.Array,
                   intr: Intrinsics, valid_mask=None,
                   config: RansacConfig = RansacConfig(threshold=1e-5)
                   ) -> EssentialResult:
    """RANSAC essential matrix from pixel correspondences. Threshold is in
    normalized-coordinate Sampson units (~(px_err / f)^2)."""
    x1 = _normalize_pixels(uv1.astype(jnp.float32), intr)
    x2 = _normalize_pixels(uv2.astype(jnp.float32), intr)
    data = jnp.concatenate([x1, x2], 1)

    def build_model(sub):
        return compute_e(sub[:, :2], sub[:, 2:])

    def residuals(e, alldata):
        return sampson_error(e, alldata[:, :2], alldata[:, 2:])

    res = ransac_mod.ransac(key, data, build_model, residuals,
                            sample_size=8, config=config,
                            valid_mask=valid_mask)
    e_refit = compute_e(x1, x2, valid=res.inlier_mask)
    ok = res.num_inliers >= 8
    e_final = jnp.where(ok, e_refit, res.model)
    # recount inliers under the refit model (a minimal 8-point fit on noisy
    # samples undercounts)
    vm = valid_mask if valid_mask is not None else jnp.ones(x1.shape[0], bool)
    mask = (sampson_error(e_final, x1, x2) <= config.threshold) & vm
    return EssentialResult(e=e_final, inlier_mask=mask,
                           num_inliers=jnp.sum(mask).astype(jnp.int32))


def decompose_essential(e: jax.Array, x1: jax.Array, x2: jax.Array,
                        valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """E -> (R (3,3), t unit (3,)) with cheirality voting over the 4
    candidate decompositions: pick the (R, t) putting the most points in
    front of both cameras. x1/x2 are normalized coords."""
    u, _, vt = linalg.svd3x3(e, sweeps=14)
    # enforce proper rotations
    u = u * jnp.where(jnp.linalg.det(u) < 0, -1.0, 1.0)
    vt = vt * jnp.where(jnp.linalg.det(vt) < 0, -1.0, 1.0)
    w = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    e.dtype)
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]

    def depth_votes(r, t):
        """Count points with positive depth in both views (midpoint-free
        linear depth from the epipolar geometry)."""
        # triangulate by solving for z1: x2_dir x (R x1_dir z1 + t) = 0
        x1d = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1), x1.dtype)], 1)
        x2d = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1), x2.dtype)], 1)
        rx1 = x1d @ r.T
        # z1 from the x/z rows: (rx1 * z1 + t) proportional to x2d
        cross = jnp.cross(x2d, rx1)
        ct = jnp.cross(x2d, jnp.broadcast_to(t, x2d.shape))
        denom = jnp.sum(cross * cross, axis=1)
        z1 = -jnp.sum(cross * ct, axis=1) / jnp.maximum(denom, 1e-12)
        p2 = rx1 * z1[:, None] + t
        ok = (z1 > 0) & (p2[:, 2] > 0) & valid
        return jnp.sum(ok)

    cands = [(r1, t), (r1, -t), (r2, t), (r2, -t)]
    votes = jnp.stack([depth_votes(r, tt) for r, tt in cands])
    best = jnp.argmax(votes)
    rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return rs[best], ts[best]
