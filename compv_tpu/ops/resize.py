"""Image resampling: bilinear (exact fixed-point parity mode + float mode),
bicubic, and the scale pyramid.

Re-design of base/image/compv_image_scale_bilinear.cxx:40-180 /
compv_image_scale_bicubic.cxx and their SIMD asm (~2.5k LoC): on TPU a resize
is a gather + lerp over a precomputed index grid; XLA turns the static-index
formulation into vectorized dynamic-slices, and the whole op is one HBM pass.

The exact mode replicates the reference's 8.8 fixed-point grid walk
(sf = int(in/out * 255), nearest = acc >> 8, frac = acc & 0xff, weights
(255 - f, f), two separately-truncated >>16 terms) so uint8 outputs are
bit-identical to CompV's scalar kernel.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Interp


def _fixed_grid(in_size: int, out_size: int):
    """Reference's fixed-point sample positions along one axis (host-side,
    static shapes)."""
    sf = int((float(in_size) / float(out_size)) * 255.0)
    acc = np.arange(out_size, dtype=np.int64) * sf
    nearest = (acc >> 8).astype(np.int32)
    frac = (acc & 0xFF).astype(np.int32)
    return nearest, frac


def resize_bilinear_u8(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """uint8 bilinear resize, bit-exact vs the reference scalar kernel
    (compv_image_scale_bilinear.cxx:40-80). Neighbor reads are clamped to the
    image instead of running into stride padding."""
    in_h, in_w = img.shape
    ny, fy = _fixed_grid(in_h, out_h)
    nx, fx = _fixed_grid(in_w, out_w)
    y0 = jnp.asarray(np.minimum(ny, in_h - 1))
    y1 = jnp.asarray(np.minimum(ny + 1, in_h - 1))
    x0 = jnp.asarray(np.minimum(nx, in_w - 1))
    x1 = jnp.asarray(np.minimum(nx + 1, in_w - 1))
    wy0 = jnp.asarray(fy, jnp.int32)[:, None]        # y0 frac
    wy1 = 255 - wy0
    wx0 = jnp.asarray(fx, jnp.int32)[None, :]
    wx1 = 255 - wx0
    a = img[y0][:, x0].astype(jnp.int32)  # top-left
    b = img[y0][:, x1].astype(jnp.int32)  # top-right
    c = img[y1][:, x0].astype(jnp.int32)  # bottom-left
    d = img[y1][:, x1].astype(jnp.int32)  # bottom-right
    top = (wy1 * (a * wx1 + b * wx0)) >> 16
    bot = (wy0 * (c * wx1 + d * wx0)) >> 16
    return (top + bot).astype(jnp.uint8)


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Float bilinear resize (higher quality than the parity mode); same
    corner convention as the reference (src = dst * in/out, no half-pixel
    offset)."""
    in_h, in_w = img.shape[:2]
    ys = jnp.arange(out_h, dtype=jnp.float32) * (in_h / out_h)
    xs = jnp.arange(out_w, dtype=jnp.float32) * (in_w / out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, in_h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, in_w - 1)
    y1 = jnp.minimum(y0 + 1, in_h - 1)
    x1 = jnp.minimum(x0 + 1, in_w - 1)
    fy = (ys - y0.astype(jnp.float32))[:, None]
    fx = (xs - x0.astype(jnp.float32))[None, :]
    im = img.astype(jnp.float32)
    a = im[y0][:, x0]
    b = im[y0][:, x1]
    c = im[y1][:, x0]
    d = im[y1][:, x1]
    out = (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
           + c * fy * (1 - fx) + d * fy * fx)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


def _cubic_weights(t: jax.Array, a: float = -0.5):
    """Keys cubic convolution weights for offsets -1..2 (the reference's
    bicubic 'hermite4' spline, compv_image_scale_bicubic.cxx)."""
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = -a * (t3 - t2)
    return w0, w1, w2, w3


def resize_bicubic(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Separable Catmull-Rom bicubic resize in float32 (the reference keeps
    bicubic in float for quality; speed_compare:76-84)."""
    in_h, in_w = img.shape[:2]
    im = img.astype(jnp.float32)

    def axis_resize(x, in_size, out_size, axis):
        pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size)
        i0 = jnp.floor(pos).astype(jnp.int32)
        t = pos - i0.astype(jnp.float32)
        w = _cubic_weights(t)
        idx = [jnp.clip(i0 + k, 0, in_size - 1) for k in (-1, 0, 1, 2)]
        gathered = [jnp.take(x, ix, axis=axis) for ix in idx]
        shape = [1, 1]
        shape[axis] = out_size
        return sum(g * wk.reshape(shape) for g, wk in zip(gathered, w))

    out = axis_resize(im, in_h, out_h, axis=0)
    out = axis_resize(out, in_w, out_w, axis=1)
    if jnp.issubdtype(img.dtype, jnp.integer):
        return jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


def resize(img: jax.Array, out_h: int, out_w: int,
           interp: Interp = Interp.BILINEAR) -> jax.Array:
    if interp == Interp.BILINEAR:
        return resize_bilinear_u8(img, out_h, out_w) if img.dtype == jnp.uint8 \
            else resize_bilinear(img, out_h, out_w)
    if interp == Interp.BICUBIC:
        return resize_bicubic(img, out_h, out_w)
    if interp == Interp.NEAREST:
        in_h, in_w = img.shape[:2]
        ys = (jnp.arange(out_h) * in_h) // out_h
        xs = (jnp.arange(out_w) * in_w) // out_w
        return img[ys][:, xs]
    raise ValueError(interp)


def pyramid_sizes(h: int, w: int, levels: int, scale_factor: float):
    """Per-level sizes, scaleFactor**level of the original (the reference
    scales every level from level 0 for quality, compv_image_scale_pyramid.
    cxx:66-114)."""
    return [(max(1, int(h * scale_factor ** lv)), max(1, int(w * scale_factor ** lv)))
            for lv in range(levels)]


def build_pyramid(img: jax.Array, levels: int, scale_factor: float,
                  interp: Interp = Interp.BILINEAR):
    """Image pyramid: list of arrays, each scaled directly from level 0
    (embarrassingly parallel on TPU — every level is an independent gather
    from the same HBM-resident source, so XLA overlaps them)."""
    h, w = img.shape[:2]
    return [img if lv == 0 else resize(img, *pyramid_sizes(h, w, levels, scale_factor)[lv],
                                       interp=interp)
            for lv in range(levels)]


def scale_factors_sum(levels: int, scale_factor: float) -> float:
    """sum(sf**level) — used for ORB per-level feature budgets (reference
    CompVImageScalePyramid::scaleFactorsSum)."""
    return float(sum(scale_factor ** lv for lv in range(levels)))
