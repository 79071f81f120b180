"""Fused multi-output separable convolution — Pallas TPU kernel.

TPU-native re-design of CompVMathConvlt (base/math/asm compv_math_convlt_*,
~3.5k LoC hand asm; reference pipeline convlt1 at
base/include/compv/base/math/compv_math_convlt.h:26-98). Where the reference
runs one convolution per call (Canny runs 2 Sobel passes back-to-back,
core/features/edges/compv_core_feature_canny_dete.cxx:123-220), this kernel
evaluates N separable filters over the SAME input in ONE HBM read: the image
tile is DMA'd to VMEM once (with halo rows, the analogue of the reference's
overlap-pad row slicing) and every filter's Hz+Vt pass runs on the VPU from
VMEM. For Sobel gx+gy that halves HBM traffic; for Gaussian blur it removes
the intermediate-row round trip entirely.

Implementation notes (Mosaic constraints):
  - tap shifts are `jnp.roll` rotates (alignment-free); the halo region
    absorbs wrap-around so the extracted interior is exact,
  - halos are 32 rows / 128 cols so the DMA slice and the final interior
    extraction are tile-aligned for every dtype,
  - uint8 loads hop through int32 (Mosaic has no direct u8->f32 cast).

Grid: one program per row tile of the output.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_ROW_TILE = 256
_HALO_R = 32   # row halo: multiple of every dtype's sublane tiling
_HALO_C = 128  # col halo: one lane tile


def _kernel_body(in_hbm, *out_refs_and_scratch, taps, tile, w_pad, n_out):
    out_refs = out_refs_and_scratch[:n_out]
    scratch, sem = out_refs_and_scratch[n_out], out_refs_and_scratch[n_out + 1]
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile + 2 * _HALO_R
    dma = pltpu.make_async_copy(
        in_hbm.at[b, pl.ds(i * tile, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]
    if x.dtype == jnp.uint8:  # Mosaic lacks a direct u8->f32 cast
        x = x.astype(jnp.int32)
    x = x.astype(jnp.float32)  # (rows, w_pad + 2*_HALO_C)
    def _roll(v, shift, axis):
        return v if shift == 0 else jnp.roll(v, shift, axis=axis)

    for o, (kx, ky) in enumerate(taps):
        rx, ry = len(kx) // 2, len(ky) // 2
        # correlation: out[c] = sum_j kx[j] * x[c + j - rx]
        hz = None
        for j, c in enumerate(kx):
            if c == 0.0:
                continue
            term = c * _roll(x, rx - j, axis=1)
            hz = term if hz is None else hz + term
        vt = None
        for j, c in enumerate(ky):
            if c == 0.0:
                continue
            term = c * _roll(hz, ry - j, axis=0)
            vt = term if vt is None else vt + term
        out_refs[o][0] = vt[_HALO_R:_HALO_R + tile, _HALO_C:_HALO_C + w_pad]


@functools.partial(jax.jit, static_argnames=("taps", "pad_mode"))
def conv_separable_fused(img: jax.Array,
                         taps: Tuple[Tuple[Tuple[float, ...],
                                           Tuple[float, ...]], ...],
                         pad_mode: str = "constant") -> Tuple[jax.Array, ...]:
    """Run every (kx, ky) separable filter in `taps` over `img` in one fused
    Pallas pass. Returns one float32 array per filter, input shape (H, W) or
    batched (B, H, W). Border = ZERO (pad_mode='constant') or REPLICATE
    (pad_mode='edge'), matching the reference border modes
    (compv_math_convlt.h COMPV_BORDER_TYPE_*)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    bsz, h, w = img.shape
    radius = max(max(len(kx), len(ky)) // 2 for kx, ky in taps)
    assert radius <= _HALO_R and radius <= _HALO_C
    tile = _ROW_TILE
    hp = -(-h // tile) * tile
    w_pad = -(-w // 128) * 128
    x = jnp.pad(img, ((0, 0), (_HALO_R, hp - h + _HALO_R),
                      (_HALO_C, w_pad - w + _HALO_C)),
                mode=pad_mode)

    n_out = len(taps)
    kern = functools.partial(_kernel_body, taps=taps, tile=tile,
                             w_pad=w_pad, n_out=n_out)
    outs = pl.pallas_call(
        kern,
        grid=(bsz, hp // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tuple(
            pl.BlockSpec((1, tile, w_pad), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bsz, hp, w_pad), jnp.float32)
            for _ in range(n_out)),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO_R, w_pad + 2 * _HALO_C), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(x)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    return tuple(o[0, :h, :w] if squeeze else o[:, :h, :w] for o in outs)


@functools.lru_cache(maxsize=None)
def conv_fused_vmappable(taps: tuple, pad_mode: str = "constant"):
    """Single-image fused-conv fn that jax.vmap routes to the batched grid
    (manual-DMA pallas_calls have no automatic batching rule)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(img):
        return conv_separable_fused(img, taps, pad_mode=pad_mode)

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        outs = conv_separable_fused(flat, taps, pad_mode=pad_mode)
        outs = tuple(o.reshape(lead + o.shape[-2:]) for o in outs)
        return outs, tuple(True for _ in outs)

    return f


def _as_taps(*pairs) -> tuple:
    return tuple((tuple(float(v) for v in np.asarray(kx).ravel()),
                  tuple(float(v) for v in np.asarray(ky).ravel()))
                 for kx, ky in pairs)


def gaussian_blur_pallas(img: jax.Array, size: int = 5, sigma: float = 2.0,
                         out_dtype=jnp.uint8,
                         pad_mode: str = "constant") -> jax.Array:
    """Gaussian blur, one fused HBM pass (reference: ORB desc blur,
    core/features/orb/compv_core_feature_orb_desc.cxx:186-204)."""
    from ..ops.convolve import gaussian_kernel1d
    k = gaussian_kernel1d(size, sigma)
    (out,) = conv_fused_vmappable(_as_taps((k, k)), pad_mode)(img)
    if out_dtype is not None and jnp.issubdtype(out_dtype, jnp.integer):
        info = jnp.iinfo(out_dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max).astype(out_dtype)
    return out


def gradients_pallas(img: jax.Array, kind: str = "sobel"):
    """Gx, Gy in ONE input pass (the reference runs two convolutions,
    canny_dete.cxx:123-220)."""
    from ..ops.convolve import SOBEL3, SCHARR3, PREWITT3
    deriv, smooth = {"sobel": SOBEL3, "scharr": SCHARR3,
                     "prewitt": PREWITT3}[kind]
    return conv_fused_vmappable(_as_taps((deriv, smooth),
                                         (smooth, deriv)))(img)
