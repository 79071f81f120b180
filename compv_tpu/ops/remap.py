"""Map-based resampling (remap), warp, and undistortion support.

Re-design of base/image/compv_image_remap.cxx:31-349 and the homography warp
path of CompVImage::warp/warpInverse (compv_image.cxx:567+): a remap on TPU
is a clamped gather + lerp over per-pixel source coordinates; out-of-ROI
samples take `default_pixel`.
"""
from __future__ import annotations

import functools

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


@functools.partial(jax.jit, static_argnames=("max_displacement", "interp",
                                             "default_pixel"))
def remap_bounded(img: jax.Array, map_x: jax.Array, map_y: jax.Array,
                  max_displacement: int,
                  interp: Interp = Interp.BILINEAR,
                  default_pixel: float = 0.0) -> jax.Array:
    """Gather-free remap for maps with BOUNDED displacement
    (|map_x - x| <= D and |map_y - y| <= D for every output pixel) — the
    undistortion / lens-correction / small-warp class. Same semantics as
    `remap` on such maps (float arithmetic reassociates; u8 outputs can
    differ by 1 gray level on exact .5 boundaries).

    Why: `remap` issues 4 scalar gathers per pixel; the XLA-TPU
    scatter/gather unit runs ~6 ns/element (measured in-repo), putting an
    HD bilinear remap at ~20 ms. Here the output is cut into (8, 128)
    tiles; each tile loads its statically-sized input window (contiguous-
    block slice, DMA-shaped) and evaluates the bilinear sample as a
    separable 2-hot contraction on the MXU:
        out(p) = w_y(p)ᵀ · W · w_x(p)
    where w_y/w_x carry the (1-f, f) bilinear weights at the two adjacent
    rows/cols — one (P, WH)x(WH, WW) matmul + a weighted row reduce per
    tile, batched over tiles with vmap.

    Pixels whose true source falls outside the window (caller violated
    the bound) clamp to the window edge; out-of-image sources yield
    `default_pixel`, like `remap`."""
    h, w = img.shape
    oh, ow = map_x.shape
    d = int(max_displacement)
    th, tw = 8, 128
    gh, gw = -(-oh // th), -(-ow // tw)
    wh, ww_ = th + 2 * d + 2, tw + 2 * d + 2
    imf = img.astype(jnp.float32)
    # pad so every tile window slices in-bounds: left/top d+1, right/bottom
    # window overhang (tile grid may also overhang the output edge)
    pad_y = gh * th + d + 2
    pad_x = gw * tw + d + 2
    pimg = jnp.pad(imf, ((d + 1, max(pad_y - h, 1)),
                         (d + 1, max(pad_x - w, 1))), mode="edge")
    mxp = jnp.pad(map_x.astype(jnp.float32),
                  ((0, gh * th - oh), (0, gw * tw - ow)))
    myp = jnp.pad(map_y.astype(jnp.float32),
                  ((0, gh * th - oh), (0, gw * tw - ow)))
    inside = ((mxp >= 0) & (mxp <= w - 1) & (myp >= 0) & (myp <= h - 1))
    # tile-major layout: (gh, gw, th, tw)
    t_mx = mxp.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    t_my = myp.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
    t_in = inside.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)

    ty0 = (jnp.arange(gh, dtype=jnp.int32) * th)[:, None]
    tx0 = (jnp.arange(gw, dtype=jnp.int32) * tw)[None, :]
    oy = jnp.broadcast_to(ty0, (gh, gw))
    ox = jnp.broadcast_to(tx0, (gh, gw))

    def tile(mx, my, y0, x0):
        # window origin in image coords: (y0 - d, x0 - d); in padded
        # coords add d+1
        win = jax.lax.dynamic_slice(pimg, (y0 + 1, x0 + 1), (wh, ww_))
        ly = jnp.clip(my - (y0 - d), 0.0, wh - 1.0).reshape(-1)
        lx = jnp.clip(mx - (x0 - d), 0.0, ww_ - 1.0).reshape(-1)
        if interp == Interp.NEAREST:
            # round in GLOBAL coordinates then shift: round-half-to-even
            # is not invariant under integer shifts, so rounding the local
            # coordinate would flip .5 ties whose shift parity differs
            # from `remap`'s global rounding
            yi = (jnp.round(my).astype(jnp.int32).reshape(-1)
                  - (y0 - d))[:, None]
            xi = (jnp.round(mx).astype(jnp.int32).reshape(-1)
                  - (x0 - d))[:, None]
            yi = jnp.clip(yi, 0, wh - 1)
            xi = jnp.clip(xi, 0, ww_ - 1)
            ohy = (yi == jnp.arange(wh)).astype(jnp.float32)
            ohx = (xi == jnp.arange(ww_)).astype(jnp.float32)
        else:
            y0i = jnp.floor(ly).astype(jnp.int32)[:, None]
            x0i = jnp.floor(lx).astype(jnp.int32)[:, None]
            fy = (ly - jnp.floor(ly))[:, None]
            fx = (lx - jnp.floor(lx))[:, None]
            ay = jnp.arange(wh, dtype=jnp.int32)
            ax = jnp.arange(ww_, dtype=jnp.int32)
            ohy = ((ay == y0i) * (1.0 - fy) + (ay == y0i + 1) * fy)
            ohx = ((ax == x0i) * (1.0 - fx) + (ax == x0i + 1) * fx)
        rows = ohy @ win                       # (P, WW)
        return jnp.sum(rows * ohx, axis=-1).reshape(th, tw)

    out = jax.vmap(jax.vmap(tile))(t_mx, t_my, oy, ox)
    out = jnp.where(t_in, out, default_pixel)
    out = out.transpose(0, 2, 1, 3).reshape(gh * th, gw * tw)[:oh, :ow]
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
