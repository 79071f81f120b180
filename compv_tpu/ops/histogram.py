"""Histogram ops: 256-bin build, equalization, axis projections.

Re-design of CompVMathHistogram (base/math/compv_math_histogram.cxx, plus
SIMD asm): on TPU a histogram is a one-hot matmul / segment-sum — the MXU
formulation (one_hot(img) summed over pixels) beats scatter-adds, which TPUs
serialize.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .binsum import apply_lut256, bincount


def histogram256(img: jax.Array) -> jax.Array:
    """(256,) int32 counts of a uint8 image.

    Factored one-hot matmul (ops/binsum.py): 16+16 indicator compares per
    pixel + one int8 MXU contraction — exact, scatter-free; a full
    one_hot(N, 256) reduction (round 1) moved 32x the data.
    """
    return bincount(img, 256)


def apply_monotone_lut(img: jax.Array, lut: jax.Array) -> jax.Array:
    """Apply a 256-entry LUT without a per-pixel gather (XLA-TPU gathers
    run ~6 ns/element; a 1.3 MP LUT apply cost 7.7 ms).  Kept under its
    historical name — the factored-matmul formulation (binsum.apply_lut256)
    no longer needs the monotonicity restriction."""
    from ..kernels.dispatch import on_tpu
    if not on_tpu():
        return lut[img.astype(jnp.int32)]
    return apply_lut256(img, lut)


def equalize(img: jax.Array) -> jax.Array:
    """Histogram equalization (reference compv_math_histogram equalization:
    lut[i] = round(cdf(i) * 255 / npixels)); the LUT is a scaled CDF and
    therefore monotone -> gather-free apply."""
    hist = histogram256(img)
    cdf = jnp.cumsum(hist)
    n = img.size
    lut = jnp.clip(jnp.round(cdf.astype(jnp.float32) * (255.0 / n)), 0, 255
                   ).astype(jnp.uint8)
    return apply_monotone_lut(img, lut)


def gamma_correct(img: jax.Array, gamma: float) -> jax.Array:
    """Gamma correction via a 256-entry LUT (reference CompVImage::gamma,
    base/include/compv/base/image/compv_image.h:15-56): out = 255*(v/255)^g
    — monotone for any gamma > 0, so the gather-free apply holds."""
    lut = jnp.clip(jnp.round(
        255.0 * (jnp.arange(256, dtype=jnp.float32) / 255.0) ** gamma),
        0, 255).astype(jnp.uint8)
    return apply_monotone_lut(img, lut)


def projection_x(img: jax.Array) -> jax.Array:
    """Column sums (reference CompVMathHistogram::buildProjectionX)."""
    return jnp.sum(img.astype(jnp.int32), axis=0)


def projection_y(img: jax.Array) -> jax.Array:
    """Row sums (reference buildProjectionY)."""
    return jnp.sum(img.astype(jnp.int32), axis=1)
