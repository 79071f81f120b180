"""Robust line & parabola fitting (RANSAC + refinement).

Re-design of CompVMathStatsFit (base/math/compv_math_stats_fit.cxx:26-120:
line/parabola total-least-squares models inside the generic RANSAC engine,
refined with vendored lmfit Levenberg-Marquardt). TPU form: the minimal and
refit solves are tiny closed-form eigen/linear problems, vectorized over
RANSAC hypothesis batches by the shared engine (geometry/ransac.py); the LM
refinement reuses geometry/lm.py.

Line model: (a, b, c) with a*x + b*y + c = 0, a^2 + b^2 = 1 (perpendicular
TLS). Parabola: y = a*x^2 + b*x + c (or sideways x = a*y^2 + ..., matching
the reference's COMPV_MATH_PARABOLA_TYPE selection).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import RansacConfig
from . import ransac as ransac_mod


def line_fit_tls(pts: jax.Array, valid=None) -> jax.Array:
    """Total-least-squares line through (N, 2) points -> (a, b, c).
    Smallest eigenvector of the 2x2 centered scatter (closed form)."""
    f = pts.astype(jnp.float32)
    if valid is None:
        w = jnp.ones((f.shape[0],), jnp.float32)
    else:
        w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(f[:, 0] * w) / n
    cy = jnp.sum(f[:, 1] * w) / n
    dx = (f[:, 0] - cx) * w
    dy = (f[:, 1] - cy) * w
    sxx = jnp.sum(dx * dx)
    sxy = jnp.sum(dx * dy)
    syy = jnp.sum(dy * dy)
    # closed-form smallest eigenvector of [[sxx, sxy], [sxy, syy]]
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    lam = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    # (a, b) ⟂ direction: eigenvector for smallest eigenvalue
    a = jnp.where(jnp.abs(sxy) > 1e-12, sxy, lam - syy)
    b = jnp.where(jnp.abs(sxy) > 1e-12, lam - sxx, sxy)
    # degenerate (axis-aligned scatter): pick dominant axis normal
    both_zero = (jnp.abs(a) < 1e-12) & (jnp.abs(b) < 1e-12)
    a = jnp.where(both_zero, jnp.where(sxx <= syy, 1.0, 0.0), a)
    b = jnp.where(both_zero, jnp.where(sxx <= syy, 0.0, 1.0), b)
    norm = jnp.sqrt(a * a + b * b)
    a, b = a / norm, b / norm
    c = -(a * cx + b * cy)
    return jnp.stack([a, b, c])


def line_distance(line: jax.Array, pts: jax.Array) -> jax.Array:
    """(N,) squared perpendicular distances (reference
    CompVMathDistance line point-distance)."""
    f = pts.astype(jnp.float32)
    d = line[0] * f[:, 0] + line[1] * f[:, 1] + line[2]
    return d * d / jnp.maximum(line[0] ** 2 + line[1] ** 2, 1e-12)


def parabola_fit(pts: jax.Array, valid=None, sideways: bool = False
                 ) -> jax.Array:
    """LSQ parabola coefficients (a, b, c): y = a x^2 + b x + c (or the
    sideways x = a y^2 + b y + c). Weighted normal equations, 3x3 solve."""
    f = pts.astype(jnp.float32)
    t = f[:, 1] if sideways else f[:, 0]
    z = f[:, 0] if sideways else f[:, 1]
    if valid is None:
        w = jnp.ones_like(t)
    else:
        w = valid.astype(jnp.float32)
    A = jnp.stack([t * t, t, jnp.ones_like(t)], axis=1) * w[:, None]
    zc = z * w
    ata = A.T @ A + 1e-6 * jnp.eye(3, dtype=jnp.float32)
    atb = A.T @ zc
    return jnp.linalg.solve(ata, atb)


def parabola_distance(coef: jax.Array, pts: jax.Array,
                      sideways: bool = False) -> jax.Array:
    """(N,) squared residuals along the dependent axis."""
    f = pts.astype(jnp.float32)
    t = f[:, 1] if sideways else f[:, 0]
    z = f[:, 0] if sideways else f[:, 1]
    pred = coef[0] * t * t + coef[1] * t + coef[2]
    d = pred - z
    return d * d


class FitResult(NamedTuple):
    model: jax.Array
    inlier_mask: jax.Array
    num_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("config",))
def fit_line_ransac(key: jax.Array, pts: jax.Array, valid_mask=None,
                    config: RansacConfig = RansacConfig(threshold=4.0)
                    ) -> FitResult:
    """Robust line fit (reference CompVMathStatsFit::line): RANSAC over
    2-point minimal sets, TLS refit on inliers."""
    res = ransac_mod.ransac(
        key, pts.astype(jnp.float32),
        build_model=lambda sub: line_fit_tls(sub),
        residuals=lambda m, d: line_distance(m, d),
        sample_size=2, config=config, valid_mask=valid_mask)
    refit = line_fit_tls(pts, valid=res.inlier_mask)
    vm = (valid_mask if valid_mask is not None
          else jnp.ones(pts.shape[0], bool))
    mask = (line_distance(refit, pts) <= config.threshold) & vm
    return FitResult(model=refit, inlier_mask=mask,
                     num_inliers=jnp.sum(mask).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("config", "sideways"))
def fit_parabola_ransac(key: jax.Array, pts: jax.Array, valid_mask=None,
                        sideways: bool = False,
                        config: RansacConfig = RansacConfig(threshold=4.0)
                        ) -> FitResult:
    """Robust parabola fit (reference CompVMathStatsFit::parabola)."""
    res = ransac_mod.ransac(
        key, pts.astype(jnp.float32),
        build_model=lambda sub: parabola_fit(sub, sideways=sideways),
        residuals=lambda m, d: parabola_distance(m, d, sideways=sideways),
        sample_size=3, config=config, valid_mask=valid_mask)
    refit = parabola_fit(pts, valid=res.inlier_mask, sideways=sideways)
    vm = (valid_mask if valid_mask is not None
          else jnp.ones(pts.shape[0], bool))
    mask = (parabola_distance(refit, pts, sideways) <= config.threshold) & vm
    return FitResult(model=refit, inlier_mask=mask,
                     num_inliers=jnp.sum(mask).astype(jnp.int32))
