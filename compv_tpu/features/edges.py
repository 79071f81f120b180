"""Sobel / Scharr / Prewitt edge detectors.

Re-design of CompVCornerDeteEdgeBase (core/features/edges/
compv_core_feature_edge_dete.cxx:55-206): convolve Gx/Gy, L1 magnitude,
global max, scale onto 0..255. The reference's overlap-halo row slicing
(edge_dete.cxx:104-141) disappears — XLA fuses the separable convs and the
reduction into whole-image passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.registry import register
from ..ops.convolve import gradients
from ..ops.mathutils import scale_and_clip_pixel8


@functools.partial(jax.jit, static_argnames=("kind",))
def edge_detect(img: jax.Array, kind: str = "sobel") -> jax.Array:
    """uint8 edge-magnitude image (reference semantics: L1 magnitude scaled
    by 255/gmax, edge_dete.cxx:55-206)."""
    gx, gy = gradients(img, kind)
    mag = jnp.abs(gx) + jnp.abs(gy)
    gmax = jnp.maximum(jnp.max(mag), 1.0)
    return scale_and_clip_pixel8(mag, 255.0 / gmax)


def edge_gradients_max(img: jax.Array, kind: str = "sobel"):
    """(gx, gy, gmax) for tests vs the reference's golden Sobel gmax
    (edge_dete.cxx:91: 1464 on the equirect image)."""
    gx, gy = gradients(img, kind)
    mag = jnp.abs(gx) + jnp.abs(gy)
    return gx, gy, jnp.max(mag)


for _kind in ("sobel", "scharr", "prewitt"):
    register("edge_detector", _kind)(
        lambda kind=_kind: (lambda img: edge_detect(img, kind)))
