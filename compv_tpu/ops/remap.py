"""Map-based resampling (remap), warp, and undistortion support.

Re-design of base/image/compv_image_remap.cxx:31-349 and the homography warp
path of CompVImage::warp/warpInverse (compv_image.cxx:567+): a remap on TPU
is a clamped gather + lerp over per-pixel source coordinates; out-of-ROI
samples take `default_pixel`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import Interp


def remap(img: jax.Array, map_x: jax.Array, map_y: jax.Array,
          interp: Interp = Interp.BILINEAR,
          default_pixel: float = 0.0,
          roi=None) -> jax.Array:
    """Sample img at float coords (map_x, map_y) (same convention as the
    reference: x = col, y = row). Shapes: map_* (H', W'). ROI is
    (left, top, right, bottom) inclusive bounds; defaults to the full image.
    """
    h, w = img.shape[:2]
    if roi is None:
        left, top, right, bottom = 0.0, 0.0, float(w - 1), float(h - 1)
    else:
        left, top, right, bottom = [float(v) for v in roi]
    inside = ((map_x >= left) & (map_x <= right)
              & (map_y >= top) & (map_y <= bottom))
    imf = img.astype(jnp.float32)

    if interp == Interp.NEAREST:
        xi = jnp.clip(jnp.round(map_x).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(map_y).astype(jnp.int32), 0, h - 1)
        out = imf[yi, xi]
    else:
        x0 = jnp.clip(jnp.floor(map_x).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(map_y).astype(jnp.int32), 0, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fx = jnp.clip(map_x - x0.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(map_y - y0.astype(jnp.float32), 0.0, 1.0)
        out = (imf[y0, x0] * (1 - fy) * (1 - fx)
               + imf[y0, x1] * (1 - fy) * fx
               + imf[y1, x0] * fy * (1 - fx)
               + imf[y1, x1] * fy * fx)

    out = jnp.where(inside, out, default_pixel)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


def warp_affine_inverse(img: jax.Array, m2x3: jax.Array, out_h: int, out_w: int,
                        interp: Interp = Interp.BILINEAR,
                        default_pixel: float = 0.0) -> jax.Array:
    """dst(x, y) = src(M @ [x, y, 1]) — the reference's warpInverse with a
    2x3 matrix (compv_image.cxx CompVImageWarpInverse)."""
    ys, xs = jnp.mgrid[0:out_h, 0:out_w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    sx = m2x3[0, 0] * xs + m2x3[0, 1] * ys + m2x3[0, 2]
    sy = m2x3[1, 0] * xs + m2x3[1, 1] * ys + m2x3[1, 2]
    return remap(img, sx, sy, interp=interp, default_pixel=default_pixel)


def warp_perspective_inverse(img: jax.Array, h3x3: jax.Array, out_h: int,
                             out_w: int, interp: Interp = Interp.BILINEAR,
                             default_pixel: float = 0.0) -> jax.Array:
    """dst(x, y) = src(H @ [x, y, 1] / w) — homography warp (reference
    CompVImage::warpInverse with 3x3)."""
    ys, xs = jnp.mgrid[0:out_h, 0:out_w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    d = h3x3[2, 0] * xs + h3x3[2, 1] * ys + h3x3[2, 2]
    d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    sx = (h3x3[0, 0] * xs + h3x3[0, 1] * ys + h3x3[0, 2]) / d
    sy = (h3x3[1, 0] * xs + h3x3[1, 1] * ys + h3x3[1, 2]) / d
    return remap(img, sx, sy, interp=interp, default_pixel=default_pixel)


def warp_perspective(img: jax.Array, h3x3: jax.Array, out_h: int, out_w: int,
                     interp: Interp = Interp.BILINEAR,
                     default_pixel: float = 0.0) -> jax.Array:
    """Forward homography warp: inverts H then calls warp_perspective_inverse
    (matches reference CompVImage::warp which inverts via pseudoinv)."""
    return warp_perspective_inverse(img, jnp.linalg.inv(h3x3), out_h, out_w,
                                    interp=interp, default_pixel=default_pixel)
