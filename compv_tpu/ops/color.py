"""Color-space conversions.

TPU-native re-design of the reference's color pipeline
(base/image/compv_image_conv_rgbfamily.cxx, compv_image_conv_hsv.cxx,
compv_image_conv_to_grayscale.cxx:35-106 and ~12k LoC of per-format SIMD
assembly under base/image/asm). On TPU these are pure VPU element-wise maps;
XLA fuses the whole conversion into one HBM pass, so a single vectorized
formulation replaces all per-format hand kernels.

Integer semantics match the reference exactly so golden-value tests transfer:
  Y =  ((33 R + 65 G + 13 B) >> 7) + 16          (conv_common.cxx:29-40)
  U = ((-38 R - 74 G + 112 B) >> 8) + 128
  V = ((112 R - 94 G - 18 B) >> 8) + 128
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import Image, PixelFormat

_I32 = jnp.int32


def _rgb_split(rgb: jax.Array):
    r = rgb[..., 0].astype(_I32)
    g = rgb[..., 1].astype(_I32)
    b = rgb[..., 2].astype(_I32)
    return r, g, b


def rgb_to_gray(rgb: jax.Array) -> jax.Array:
    """RGB24 -> GRAY8 with the reference's exact fixed-point weights."""
    r, g, b = _rgb_split(rgb)
    y = ((33 * r + 65 * g + 13 * b) >> 7) + 16
    return jnp.clip(y, 0, 255).astype(jnp.uint8)


def bgr_to_gray(bgr: jax.Array) -> jax.Array:
    return rgb_to_gray(bgr[..., ::-1])


def rgba_to_gray(rgba: jax.Array) -> jax.Array:
    return rgb_to_gray(rgba[..., :3])


def rgb_to_yuv444(rgb: jax.Array):
    r, g, b = _rgb_split(rgb)
    y = ((33 * r + 65 * g + 13 * b) >> 7) + 16
    u = ((-38 * r - 74 * g + 112 * b) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b) >> 8) + 128
    clip = lambda p: jnp.clip(p, 0, 255).astype(jnp.uint8)
    return clip(y), clip(u), clip(v)


def rgb_to_yuv420(rgb: jax.Array):
    """RGB -> planar YUV420: chroma is 2x2 box-subsampled from 444."""
    y, u, v = rgb_to_yuv444(rgb)
    sub = lambda p: p.reshape(p.shape[:-2] + (p.shape[-2] // 2, 2,
                                              p.shape[-1] // 2, 2)) \
        .astype(jnp.uint16).mean(axis=(-3, -1)).astype(jnp.uint8)
    return y, sub(u), sub(v)


def _yuv_to_rgb_int(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """BT.601 studio-swing YUV -> RGB, fixed-point as in the reference
    (compv_image_conv_to_rgbx.cxx):
      R = (37Y' + 51V') >> 5 ; G = (37Y' - 13U' - 26V') >> 5
      B = (37Y' + 65U') >> 5   with Y'=Y-16, U'=U-128, V'=V-128.
    """
    yp = (y.astype(_I32) - 16) * 37
    up = u.astype(_I32) - 128
    vp = v.astype(_I32) - 128
    r = (yp + 51 * vp) >> 5
    g = (yp - 13 * up - 26 * vp) >> 5
    b = (yp + 65 * up) >> 5
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def yuv444_to_rgb(y, u, v):
    return _yuv_to_rgb_int(y, u, v)


def _upsample2x_nearest(p: jax.Array, h: int, w: int) -> jax.Array:
    """2x nearest-neighbor upsample of a (..., h/2, w/2) u8 plane to
    (..., h, w) i32 via one-hot MXU matmuls.

    jnp.repeat along the lane (minor) axis is an interleave relayout on
    TPU (~100 us at HD — it made yuv420_to_rgb LOSE to the reference's
    CPU asm, BENCH_DETAIL round 3); a duplication matrix ridden on the
    MXU is exact for u8 in bf16 (0/1 indicators, single product per
    output) and runs at matmul speed instead."""
    hh, hw = p.shape[-2], p.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, hh), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, hh), 1)
    s_r = (rows // 2 == cols).astype(jnp.bfloat16)          # (h, h/2)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (hw, w), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (hw, w), 1)
    s_c = (cols2 // 2 == rows2).astype(jnp.bfloat16)        # (w/2, w)
    half = jnp.einsum("rk,...kc->...rc", s_r, p.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    full = jnp.einsum("...rk,kc->...rc", half.astype(jnp.bfloat16), s_c,
                      preferred_element_type=jnp.float32)
    return full.astype(jnp.int32)


def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Planar YUV420 -> RGB24; chroma upsampled by nearest (as the reference's
    SIMD kernels duplicate each chroma sample over a 2x2 luma block).
    The upsample rides the MXU (see _upsample2x_nearest)."""
    h, w = y.shape[-2], y.shape[-1]
    up = _upsample2x_nearest(u, h, w)
    vp = _upsample2x_nearest(v, h, w)
    return _yuv_to_rgb_int(y, up, vp)


def nv12_to_rgb(y: jax.Array, uv: jax.Array) -> jax.Array:
    return yuv420_to_rgb(y, uv[..., 0], uv[..., 1])


# ----------------------------- packed 4:2:2 family -------------------------
# Reference: base/image/compv_image_conv_to_rgbx.cxx + asm cover the packed
# YUV422 layouts (YUYV422, UYVY422); round 1 shipped only planar formats.
# Layout (YUYV): bytes [Y0 U Y1 V] per 2-pixel group -> input (..., H, 2W).
# Chroma covers a 1x2 luma pair and is duplicated (same siting as the
# reference SIMD kernels).

def _packed422_planes(buf: jax.Array, y_off: int, u_off: int, v_off: int):
    y = jnp.stack([buf[..., y_off::4], buf[..., y_off + 2::4]],
                  axis=-1).reshape(buf.shape[:-1] + (buf.shape[-1] // 2,))
    u = buf[..., u_off::4]
    v = buf[..., v_off::4]
    up = jnp.repeat(u, 2, axis=-1)
    vp = jnp.repeat(v, 2, axis=-1)
    return y, up, vp


def yuyv422_to_rgb(buf: jax.Array) -> jax.Array:
    """Packed YUYV422 (..., H, 2W) u8 -> RGB24 (..., H, W, 3)."""
    y, u, v = _packed422_planes(buf, 0, 1, 3)
    return _yuv_to_rgb_int(y, u, v)


def uyvy422_to_rgb(buf: jax.Array) -> jax.Array:
    """Packed UYVY422 (..., H, 2W) u8 -> RGB24 (..., H, W, 3)."""
    y, u, v = _packed422_planes(buf, 1, 0, 2)
    return _yuv_to_rgb_int(y, u, v)


def yuyv422_to_gray(buf: jax.Array) -> jax.Array:
    """Packed YUYV422 -> GRAY8 is just the de-interleaved luma
    (reference compv_image_conv_to_grayscale.cxx packed cases)."""
    y, _, _ = _packed422_planes(buf, 0, 1, 3)
    return y


def uyvy422_to_gray(buf: jax.Array) -> jax.Array:
    y, _, _ = _packed422_planes(buf, 1, 0, 2)
    return y


def rgb_to_yuyv422(rgb: jax.Array) -> jax.Array:
    """RGB24 (..., H, W, 3) -> packed YUYV422 (..., H, 2W) u8; chroma is
    the mean of each horizontal pair (the reference's subsample rule)."""
    y, u, v = rgb_to_yuv444(rgb)
    u2 = ((u[..., 0::2].astype(jnp.uint16)
           + u[..., 1::2].astype(jnp.uint16)) // 2).astype(jnp.uint8)
    v2 = ((v[..., 0::2].astype(jnp.uint16)
           + v[..., 1::2].astype(jnp.uint16)) // 2).astype(jnp.uint8)
    out = jnp.stack([y[..., 0::2], u2, y[..., 1::2], v2], axis=-1)
    return out.reshape(rgb.shape[:-3] + (rgb.shape[-3],
                                         2 * rgb.shape[-2]))


def rgb_to_uyvy422(rgb: jax.Array) -> jax.Array:
    y, u, v = rgb_to_yuv444(rgb)
    u2 = ((u[..., 0::2].astype(jnp.uint16)
           + u[..., 1::2].astype(jnp.uint16)) // 2).astype(jnp.uint8)
    v2 = ((v[..., 0::2].astype(jnp.uint16)
           + v[..., 1::2].astype(jnp.uint16)) // 2).astype(jnp.uint8)
    out = jnp.stack([u2, y[..., 0::2], v2, y[..., 1::2]], axis=-1)
    return out.reshape(rgb.shape[:-3] + (rgb.shape[-3],
                                         2 * rgb.shape[-2]))


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """RGB -> HSV with the reference's EXACT 8-bit semantics
    (compv_image_conv_hsv.cxx:289-306): H = u8(round_half_away(43 * diff /
    minus)) + {0, 85, 171} with u8 wraparound, S = u8(round_half_away(255
    * minus / max)), V = max.  The reference reads 1/minus and 1/max from
    float32 tables; a per-pixel LUT gather is a TPU anti-pattern, so we
    use live f32 division — within 1 ulp of the table (tests assert
    exactness against a NumPy oracle using the same f32 division,
    tests/test_scalar_oracles.py)."""
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    maxv = jnp.maximum(r, jnp.maximum(g, b))
    minv = jnp.minimum(r, jnp.minimum(g, b))
    minus = maxv - minv
    diff = jnp.where(maxv == r, g - b, jnp.where(maxv == g, b - r, r - g))
    inv_minus = jnp.where(
        minus > 0, 43.0 / jnp.maximum(minus, 1).astype(jnp.float32), 0.0)
    inv_max = jnp.where(
        maxv > 0, 255.0 / jnp.maximum(maxv, 1).astype(jnp.float32), 0.0)
    s43 = diff.astype(jnp.float32) * inv_minus
    s255 = minus.astype(jnp.float32) * inv_max

    def round_away(x):   # C (int)(x +- 0.5): half away from zero
        return (jnp.floor(jnp.abs(x) + 0.5)
                * jnp.sign(x)).astype(jnp.int32)

    offs = jnp.where(maxv == r, 0, jnp.where(maxv == g, 85, 171))
    h = ((round_away(s43) & 255) + offs) & 255
    s = round_away(s255)
    hsv = jnp.stack([h, s, maxv], axis=-1)
    return hsv.astype(jnp.uint8)


def yuv420_to_hsv(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Planar YUV420 -> HSV (reference benches this composite directly,
    speed_compare:38-42; compv_image_conv_to_hsv.cxx routes YUV through
    RGB the same way)."""
    return rgb_to_hsv(yuv420_to_rgb(y, u, v))


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h = hsv[..., 0].astype(jnp.float32) * (6.0 / 255.0)
    s = hsv[..., 1].astype(jnp.float32) / 255.0
    v = hsv[..., 2].astype(jnp.float32)
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def split_channels(img: jax.Array):
    """Image split (reference CompVImage::split): packed (H,W,C) -> C planes."""
    return tuple(img[..., c] for c in range(img.shape[-1]))


def merge_channels(*planes):
    return jnp.stack(planes, axis=-1)


def to_grayscale(image: Image) -> jax.Array:
    """Any supported format -> GRAY8 (reference
    compv_image_conv_to_grayscale.cxx:35-106)."""
    fmt = image.fmt
    if fmt == PixelFormat.GRAY8:
        return image.plane(0)
    if fmt in (PixelFormat.YUV420P, PixelFormat.YUV444P, PixelFormat.NV12):
        return image.plane(0)  # luma plane IS grayscale
    if fmt == PixelFormat.RGB24:
        return rgb_to_gray(image.plane(0))
    if fmt == PixelFormat.BGR24:
        return bgr_to_gray(image.plane(0))
    if fmt == PixelFormat.RGBA32:
        return rgba_to_gray(image.plane(0))
    if fmt == PixelFormat.HSV:
        return rgb_to_gray(hsv_to_rgb(image.plane(0)))
    raise ValueError(f"unsupported format {fmt}")
