"""Canny edge detector.

Re-design of core/features/edges/compv_core_feature_canny_dete.cxx (682 LoC
C++ + NMS/hysteresis SSE/AVX/NEON asm): the reference's three MT stages
(overlap-padded Sobel convolution -> direction-quantized NMS gather/apply ->
row-batched 8-connected hysteresis with candidate stacks) become:

  1. Sobel Gx/Gy (fused separable convs).
  2. L1 magnitude + 4-sector direction NMS as a dense masked select —
     the reference's gather/apply two-pass exists only to avoid read-write
     races between threads; a pure-functional formulation needs one pass.
  3. Hysteresis as an iterate-to-fixpoint dilation: strong |= weak &
     dilate3x3(strong), run under lax.while_loop until no change (the
     parallel-graph-reachability formulation of the reference's sequential
     stack walk, canny_dete.cxx:462-530).

Thresholds: absolute (tLow/tHigh) like the reference's defaults, or
percent-of-mean via `threshold_from_mean`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import CannyConfig
from ..core.registry import register
from ..ops.convolve import gradients


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Neighbor view with zero padding."""
    h, w = x.shape
    pad = jnp.pad(x, 1)
    return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))


def nms_directional(mag: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Suppress non-maxima along the quantized gradient direction
    (reference CompVCannyNMSGather semantics: 4 sectors at 22.5° boundaries,
    compare the two neighbors across the edge)."""
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    # sector tests via slope comparisons (tan 22.5° = 0.4142, tan 67.5° = 2.4142)
    t1 = 0.41421356
    t2 = 2.41421356
    horiz = ay <= t1 * ax                      # gradient ~ horizontal -> compare L/R
    vert = ay >= t2 * ax                       # gradient ~ vertical -> compare U/D
    same_sign = (gx * gy) >= 0                 # 45° vs 135° diagonal
    n_l, n_r = _shift(mag, 0, -1), _shift(mag, 0, 1)
    n_u, n_d = _shift(mag, -1, 0), _shift(mag, 1, 0)
    n_ul, n_dr = _shift(mag, -1, -1), _shift(mag, 1, 1)
    n_ur, n_dl = _shift(mag, -1, 1), _shift(mag, 1, -1)
    nb1 = jnp.where(horiz, n_l, jnp.where(vert, n_u,
                    jnp.where(same_sign, n_ul, n_ur)))
    nb2 = jnp.where(horiz, n_r, jnp.where(vert, n_d,
                    jnp.where(same_sign, n_dr, n_dl)))
    keep = (mag > nb1) & (mag >= nb2)
    return jnp.where(keep, mag, 0.0)


def hysteresis(mag: jax.Array, low: float, high: float,
               max_iters: int = 256) -> jax.Array:
    """8-connected hysteresis to fixpoint: strong pixels seed, weak pixels
    join when 8-adjacent to an accepted pixel."""
    weak = mag > low
    strong = mag > high

    def dilate8(m):
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out | _shift(m, dy, dx)
        return out

    def cond(state):
        cur, prev_count, it = state
        return (jnp.sum(cur) != prev_count) & (it < max_iters)

    def body(state):
        cur, _, it = state
        grown = (weak & dilate8(cur)) | cur
        return grown, jnp.sum(cur), it + 1

    init = (strong, jnp.asarray(-1, jnp.int64 if jax.config.jax_enable_x64
                                else jnp.int32), jnp.asarray(0, jnp.int32))
    final, _, _ = jax.lax.while_loop(cond, body, init)
    return final


@functools.partial(jax.jit, static_argnames=("config",))
def canny(img: jax.Array, config: CannyConfig = CannyConfig()) -> jax.Array:
    """uint8 {0, 255} edge map (reference CompVEdgeDeteCanny::process)."""
    gx, gy = gradients(img, "sobel")
    mag = jnp.abs(gx) + jnp.abs(gy)       # L1, like the reference
    nms = nms_directional(mag, gx, gy)
    edges = hysteresis(nms, config.low, config.high)
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 1) & (ys < h - 1) & (xs >= 1) & (xs < w - 1)
    return jnp.where(edges & interior, jnp.uint8(255), jnp.uint8(0))


def threshold_from_mean(img: jax.Array, low_frac: float = 0.66,
                        high_frac: float = 1.33) -> Tuple[jax.Array, jax.Array]:
    """Percent-of-mean thresholds (reference's COMPV_CANNY_THRESHOLD_TYPE
    PERCENT_OF_MEAN mode)."""
    gx, gy = gradients(img, "sobel")
    mean = jnp.mean(jnp.abs(gx) + jnp.abs(gy))
    return low_frac * mean, high_frac * mean


@register("edge_detector", "canny")
def make_canny(config: CannyConfig = CannyConfig()):
    """Factory (reference COMPV_CANNY_ID)."""

    def run(img: jax.Array) -> jax.Array:
        return canny(img, config)

    return run
