"""Math utilities: stats, normalization, patch moments, fast trig.

Covers the reference's CompVMathStats (base/include/compv/base/math/
compv_math_stats.h:19-26), CompVMathUtils (compv_math_utils.cxx), and
CompVPatch circular moments (base/compv_patch.cxx:58+, asm ~1.9k LoC).
On TPU these are fused VPU reductions; the patch-moment gather becomes a
masked windowed reduction (vmapped over points).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- statistics

def variance(x: jax.Array, mean=None) -> jax.Array:
    """Unbiased variance, reference semantics (divide by N-1,
    compv_math_stats.cxx variance)."""
    x = x.astype(jnp.float64) if x.dtype == jnp.float64 else x.astype(jnp.float32)
    if mean is None:
        mean = jnp.mean(x)
    n = x.size
    return jnp.sum((x - mean) ** 2) / jnp.asarray(max(n - 1, 1), x.dtype)


def stdev(x: jax.Array, mean=None) -> jax.Array:
    return jnp.sqrt(variance(x, mean))


def normalize2d_hartley(pts: jax.Array, valid=None):
    """Hartley normalization of (N,2) points: translate centroid to origin,
    scale mean distance to sqrt(2) (reference normalize2D_hartley,
    compv_math_stats.cxx). Returns (T 3x3, normalized points).

    ``valid`` optionally masks padded rows.
    """
    f = pts.astype(jnp.float32)
    if valid is None:
        w = jnp.ones((pts.shape[0],), jnp.float32)
    else:
        w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(f[:, 0] * w) / n
    cy = jnp.sum(f[:, 1] * w) / n
    d = jnp.sqrt((f[:, 0] - cx) ** 2 + (f[:, 1] - cy) ** 2)
    mean_d = jnp.sum(d * w) / n
    s = jnp.sqrt(2.0) / jnp.where(mean_d < 1e-12, 1e-12, mean_d)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * cx).at[1, 2].set(-s * cy)
    normed = jnp.stack([(f[:, 0] - cx) * s, (f[:, 1] - cy) * s], axis=1)
    return T, normed


def mse2d_homogeneous(ax, ay, az, bx, by):
    """Squared error between homogeneous a and cartesian b per point
    (reference mse2D_homogeneous)."""
    inv = 1.0 / jnp.where(jnp.abs(az) < 1e-12, 1e-12, az)
    ex = ax * inv - bx
    ey = ay * inv - by
    return ex * ex + ey * ey


def scale_and_clip_pixel8(x: jax.Array, scale: jax.Array) -> jax.Array:
    """(x * scale) clipped to uint8 (reference scaleAndClipPixel8, used by
    edge detectors to map gradient magnitude onto 0..255)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * scale), 0, 255).astype(jnp.uint8)


def norm_l2(x: jax.Array, axis=None) -> jax.Array:
    """L2-normalize (reference normL2, compv_math_stats.h:19-26)."""
    n = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=axis,
                         keepdims=axis is not None))
    return x / jnp.maximum(n, 1e-12)


def norm_minmax(x: jax.Array) -> jax.Array:
    """Scale into [0, 1] (reference normMinmax)."""
    f = x.astype(jnp.float32)
    lo, hi = jnp.min(f), jnp.max(f)
    return (f - lo) / jnp.maximum(hi - lo, 1e-12)


def norm_zscore(x: jax.Array) -> jax.Array:
    """Zero-mean unit-variance (reference normZscore)."""
    f = x.astype(jnp.float32)
    return (f - jnp.mean(f)) / jnp.maximum(stdev(f), 1e-12)


# ------------------------------------------------------------- patch moments

@functools.lru_cache(maxsize=None)
def _circular_mask(radius: int):
    """Boolean circular mask + coordinate grids of diameter 2r+1, matching
    the reference's per-row max-abscissa circle (compv_patch.cxx
    initMaxAbscissas: dx = sqrt(r^2 - y^2))."""
    d = 2 * radius + 1
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    mask = (np.abs(xx) <= np.sqrt(radius * radius - yy * yy + 1e-9))
    # NOTE: return host numpy (hashable via lru_cache) — returning jnp arrays
    # from a cache leaks tracers when first called under jit.
    return (mask.astype(np.float32), xx.astype(np.float32), yy.astype(np.float32))


def patch_moments01_10(img: jax.Array, xy: jax.Array, radius: int):
    """Circular-patch image moments (m01, m10) for each point in (N,2) xy
    (reference CompVPatch::moments0110) — vmapped dynamic-slice windows.
    Points too close to the border return zero moments (the reference erases
    those points beforehand; orb_dete.cxx eraseTooCloseToBorder).
    """
    mask_np, mx_np, my_np = _circular_mask(radius)
    mask, mx, my = jnp.asarray(mask_np), jnp.asarray(mx_np), jnp.asarray(my_np)
    h, w = img.shape
    d = 2 * radius + 1
    imf = img.astype(jnp.float32)

    def per_point(p):
        x = jnp.round(p[0]).astype(jnp.int32)
        y = jnp.round(p[1]).astype(jnp.int32)
        ok = (x >= radius) & (y >= radius) & (x + radius < w) & (y + radius < h)
        x0 = jnp.clip(x - radius, 0, w - d)
        y0 = jnp.clip(y - radius, 0, h - d)
        win = jax.lax.dynamic_slice(imf, (y0, x0), (d, d)) * mask
        m01 = jnp.sum(win * my)
        m10 = jnp.sum(win * mx)
        return jnp.where(ok, m01, 0.0), jnp.where(ok, m10, 0.0)

    return jax.vmap(per_point)(xy)


def orientations(img: jax.Array, xy: jax.Array, radius: int) -> jax.Array:
    """Intensity-centroid orientation atan2(m01, m10) in radians per point
    (reference orb_dete.cxx:336-343 computes degrees; we keep radians)."""
    m01, m10 = patch_moments01_10(img, xy, radius)
    return jnp.arctan2(m01, m10)


# ------------------------------------------------------------------ clipping

def clip3(minv, maxv, v):
    return jnp.clip(v, minv, maxv)
