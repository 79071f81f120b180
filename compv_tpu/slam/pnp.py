"""Perspective-n-Point: camera pose from 3D-2D correspondences.

Beyond-reference subsystem (frontend tracking needs it; the reference has no
3D pipeline). Linear DLT pose (vmappable -> RANSAC minimal solver over
6-point samples) + LM polish on inliers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import RansacConfig
from ..geometry import linalg, ransac as ransac_mod
from ..geometry.lm import levenberg_marquardt
from .camera import Intrinsics, project_batch, so3_log


def pnp_dlt(pts3d: jax.Array, uv: jax.Array, intr: Intrinsics,
            valid=None) -> jax.Array:
    """Linear pose from >= 6 points: DLT for the 3x4 projection matrix in
    normalized camera coordinates, then orthonormalize R. Returns (6,)."""
    x = (uv[:, 0] - intr.cx) / intr.fx
    y = (uv[:, 1] - intr.cy) / intr.fy
    n = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((n, 1), pts3d.dtype)], 1)  # (N,4)
    zero = jnp.zeros_like(X)
    rows1 = jnp.concatenate([X, zero, -x[:, None] * X], 1)          # (N,12)
    rows2 = jnp.concatenate([zero, X, -y[:, None] * X], 1)
    a = jnp.concatenate([rows1, rows2], 0)
    if valid is not None:
        w = jnp.concatenate([valid, valid]).astype(a.dtype)
        a = a * w[:, None]
    p = linalg.min_eigenvector(a.T @ a, sweeps=14).reshape(3, 4)
    r_raw = p[:, :3]
    # scale so R has unit determinant magnitude; fix sign via cheirality
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(r_raw)) + 1e-20)
    p = p / scale
    depths = X @ p[2]
    nvalid = valid.astype(jnp.float32) if valid is not None else jnp.ones(n)
    sign = jnp.where(jnp.sum(jnp.sign(depths) * nvalid) < 0, -1.0, 1.0)
    p = p * sign
    u, _, vt = linalg.svd_via_ata(p[:, :3], sweeps=14)
    r = u @ vt
    r = r * jnp.where(jnp.linalg.det(r) < 0, -1.0, 1.0)
    return jnp.concatenate([so3_log(r), p[:, 3]])


class PnPResult(NamedTuple):
    pose: jax.Array          # (6,)
    inlier_mask: jax.Array
    num_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("config", "polish_iters"))
def solve_pnp(key: jax.Array, pts3d: jax.Array, uv: jax.Array,
              intr: Intrinsics, valid_mask=None,
              config: RansacConfig = RansacConfig(threshold=9.0),
              polish_iters: int = 15) -> PnPResult:
    """RANSAC PnP (squared-pixel inlier threshold) + LM polish on inliers."""
    data = jnp.concatenate([pts3d, uv], 1).astype(jnp.float32)

    def build_model(sub):
        return pnp_dlt(sub[:, :3], sub[:, 3:], intr)

    def residuals(wt, alldata):
        pred = project_batch(wt, intr, alldata[:, :3])
        d = pred - alldata[:, 3:]
        return jnp.sum(d * d, axis=1)

    res = ransac_mod.ransac(key, data, build_model, residuals,
                            sample_size=6, config=config,
                            valid_mask=valid_mask)
    inl = res.inlier_mask.astype(jnp.float32)

    def lm_residual(wt):
        pred = project_batch(wt, intr, pts3d.astype(jnp.float32))
        return ((pred - uv.astype(jnp.float32)) * inl[:, None]).reshape(-1)

    polished = levenberg_marquardt(lm_residual, res.model,
                                   max_iters=polish_iters)
    # accept the polish ONLY if it keeps at least the RANSAC inlier count —
    # a diverged-but-finite LM fit must not replace a good RANSAC pose
    vm = valid_mask if valid_mask is not None else jnp.ones(pts3d.shape[0], bool)
    mask_pol = (residuals(polished.params, data) <= config.threshold) & vm
    mask_ran = (residuals(res.model, data) <= config.threshold) & vm
    n_pol = jnp.sum(mask_pol)
    n_ran = jnp.sum(mask_ran)
    use_pol = (jnp.all(jnp.isfinite(polished.params)) & (n_pol >= n_ran)
               & (res.num_inliers >= 6))
    pose = jnp.where(use_pol, polished.params, res.model)
    mask = jnp.where(use_pol, mask_pol, mask_ran)
    return PnPResult(pose=pose, inlier_mask=mask,
                     num_inliers=jnp.where(use_pol, n_pol,
                                           n_ran).astype(jnp.int32))
