"""S-HOG descriptor (standard HOG, dense).

Re-design of core/features/hog/compv_core_feature_hog_std.cxx:104-745 (+
SSE2/AVX2/NEON asm): GradientFast magnitude+direction -> per-cell 9-bin
histograms with linear bin interpolation -> 2x2-cell block descriptors with
{none, L1, L1sqrt, L2, L2Hys} normalization -> row-major feature vector.

TPU formulation: bin interpolation is a dense one-hot-weighted pair of
(H, W, nbins) planes; cell pooling is a reshape-sum; block assembly is a
strided window stack — all VPU work, one fused pass per stage; no
per-cell loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HogConfig
from ..core.registry import register
from ..ops.convolve import gradient_fast


def _cell_histograms(img: jax.Array, cell: int, nbins: int,
                     signed_grad: bool) -> jax.Array:
    """(H/cell, W/cell, nbins) interpolated orientation histograms."""
    gx, gy = gradient_fast(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)                      # [-pi, pi]
    period = 2.0 * np.pi if signed_grad else np.pi
    ang = jnp.where(ang < 0, ang + period, ang)
    ang = jnp.where(ang >= period, ang - period, ang)
    # continuous bin coordinate and linear interpolation between the two
    # nearest bins (reference hog_std.h:20-70 LUT does exactly this)
    binf = ang * (nbins / period)
    b0 = jnp.floor(binf).astype(jnp.int32) % nbins
    b1 = (b0 + 1) % nbins
    w1 = binf - jnp.floor(binf)
    w0 = 1.0 - w1
    oh0 = jax.nn.one_hot(b0, nbins, dtype=jnp.float32) * (mag * w0)[..., None]
    oh1 = jax.nn.one_hot(b1, nbins, dtype=jnp.float32) * (mag * w1)[..., None]
    votes = oh0 + oh1                              # (H, W, nbins)
    h, w = img.shape
    ch, cw = h // cell, w // cell
    votes = votes[: ch * cell, : cw * cell]
    return votes.reshape(ch, cell, cw, cell, nbins).sum(axis=(1, 3))


def _normalize(block: jax.Array, kind: str, eps: float = 1e-6) -> jax.Array:
    """Block normalization over the last axis (reference norm kernels)."""
    if kind == "none":
        return block
    if kind == "l1":
        return block / (jnp.sum(jnp.abs(block), -1, keepdims=True) + eps)
    if kind == "l1sqrt":
        return jnp.sqrt(block / (jnp.sum(jnp.abs(block), -1, keepdims=True) + eps))
    if kind == "l2":
        return block * jax.lax.rsqrt(
            jnp.sum(block * block, -1, keepdims=True) + eps * eps)
    if kind == "l2hys":
        out = block * jax.lax.rsqrt(
            jnp.sum(block * block, -1, keepdims=True) + eps * eps)
        out = jnp.clip(out, 0.0, 0.2)   # Dalal-Triggs clip
        return out * jax.lax.rsqrt(
            jnp.sum(out * out, -1, keepdims=True) + eps * eps)
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnames=("config",))
def hog(img: jax.Array, config: HogConfig = HogConfig()) -> jax.Array:
    """Dense HOG feature vector, row-major over blocks (reference layout:
    block rows x block cols x (cells-per-block * nbins))."""
    cell = config.cell_size
    nbins = config.nbins
    cells = _cell_histograms(img, cell, nbins, config.signed_gradient)
    ch, cw, _ = cells.shape
    bc = config.block_size // cell                 # cells per block side
    stride_c = config.block_stride // cell
    nby = (ch - bc) // stride_c + 1
    nbx = (cw - bc) // stride_c + 1
    # gather block windows: (nby, nbx, bc, bc, nbins) via static slicing
    rows = []
    for dy in range(bc):
        cols = []
        for dx in range(bc):
            view = cells[dy: dy + stride_c * nby: stride_c,
                         dx: dx + stride_c * nbx: stride_c]
            cols.append(view)
        rows.append(jnp.stack(cols, axis=2))       # (nby, nbx, bc, nbins)
    blocks = jnp.stack(rows, axis=2)               # (nby, nbx, bc, bc, nbins)
    blocks = blocks.reshape(nby, nbx, bc * bc * nbins)
    blocks = _normalize(blocks, config.norm)
    return blocks.reshape(-1)


def hog_descriptor_size(h: int, w: int, config: HogConfig = HogConfig()) -> int:
    cell = config.cell_size
    bc = config.block_size // cell
    stride_c = config.block_stride // cell
    ch, cw = h // cell, w // cell
    nby = (ch - bc) // stride_c + 1
    nbx = (cw - bc) // stride_c + 1
    return nby * nbx * bc * bc * config.nbins


@register("hog", "s-hog")
def make_hog(config: HogConfig = HogConfig()):
    """Factory (reference COMPV_HOGS_ID)."""

    def run(img: jax.Array) -> jax.Array:
        return hog(img, config)

    return run
