"""Erode/dilate — fused Pallas TPU kernel.

Re-design of CompVMathMorph's SIMD kernels (base/math/asm morph x64 sse/avx
+ neon, ~?? LoC; scalar at base/math/compv_math_morph.cxx:69-250). The jnp
shift-and-reduce formulation (ops/morphology.py) is correct but XLA lowers
its unaligned uint8 slices as relayout copies (~10x off roofline); this
kernel does the same min/max folds as VMEM rotates in one HBM pass, same
structure as kernels/conv_sep.py.
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
_HALO_R = 32
_HALO_C = 128


def _kernel(in_hbm, out_ref, scratch, sem, *, taps, tile, w_pad, is_erode):
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile + 2 * _HALO_R
    dma = pltpu.make_async_copy(
        in_hbm.at[b, pl.ds(i * tile, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:].astype(jnp.int32)
    op = jnp.minimum if is_erode else jnp.maximum
    out = None
    for dy, dx in taps:
        t = x
        if dy:
            t = jnp.roll(t, -dy, axis=0)
        if dx:
            t = jnp.roll(t, -dx, axis=1)
        out = t if out is None else op(out, t)
    out_ref[0] = out[_HALO_R:_HALO_R + tile,
                     _HALO_C:_HALO_C + w_pad].astype(jnp.uint8)


def _tile_for(n_taps: int, base: int) -> int:
    """Mosaic's scheduler keeps ~O(n_taps) rolled i32 planes live; scale
    the row tile down so peak scoped VMEM stays under the 16 MB limit
    (25-tap rect5 at 1285^2 OOM'd at the full tile, found 2026-08-20)."""
    if n_taps <= 9:
        return base
    if n_taps <= 15:
        return max(base // 2, 32)
    return max(base // 4, 32)


@functools.partial(jax.jit, static_argnames=("taps", "is_erode"))
def _morph_pallas(img: jax.Array, taps: Tuple[Tuple[int, int], ...],
                  is_erode: bool) -> jax.Array:
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    bsz, h, w = img.shape
    tile = _tile_for(len(taps), _ROW_TILE)
    hp = -(-h // tile) * tile
    w_pad = -(-w // 128) * 128
    # REPLICATE border (reference default); the extra alignment padding
    # also replicates, so rolled taps read clamped values
    x = jnp.pad(img, ((0, 0), (_HALO_R, hp - h + _HALO_R),
                      (_HALO_C, w_pad - w + _HALO_C)), mode="edge")
    kern = functools.partial(_kernel, taps=taps, tile=tile, w_pad=w_pad,
                             is_erode=is_erode)
    out = pl.pallas_call(
        kern,
        grid=(bsz, hp // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile, w_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w_pad), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO_R, w_pad + 2 * _HALO_C), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(x)
    out = out[:, :h, :w]
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=None)
def _morph_vmappable(taps, is_erode):
    """jax.vmap routes to the natively-batched kernel (manual-DMA
    pallas_calls have no automatic batching rule)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(img):
        return _morph_pallas(img, taps, is_erode)

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        out = _morph_pallas(flat, taps, is_erode)
        return out.reshape(lead + out.shape[-2:]), True

    return f


def morph_pallas(img: jax.Array, strel: np.ndarray,
                 is_erode: bool) -> jax.Array:
    """Erode (min) / dilate (max) with a flat strel over uint8."""
    hh, ww = strel.shape
    ry, rx = hh // 2, ww // 2
    taps = tuple((dy - ry, dx - rx) for dy in range(hh) for dx in range(ww)
                 if strel[dy, dx])
    return _morph_vmappable(taps, is_erode)(img)


_HALO_R2 = 8       # fused kernel: minimal 8-row halo (covers 2r <= 8);
#                    tile adapts to DOUBLE the tap count (two passes)


def _kernel2(in_hbm, out_ref, scratch, sem, *, taps, tile, w_pad,
             first_erode, ry, rx, h, w):
    """Fused open/close: first op over the halo'd tile, second op on the
    intermediate — one HBM read + one write for both passes."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile + 2 * _HALO_R2
    dma = pltpu.make_async_copy(
        in_hbm.at[b, pl.ds(i * tile, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:].astype(jnp.int32)
    op1 = jnp.minimum if first_erode else jnp.maximum
    op2 = jnp.maximum if first_erode else jnp.minimum

    mid = None
    for dy, dx in taps:
        t = x
        if dy:
            t = jnp.roll(t, -dy, axis=0)
        if dx:
            t = jnp.roll(t, -dx, axis=1)
        mid = t if mid is None else op1(mid, t)
    # Two-pass semantics replicate the INTERMEDIATE at image borders (both
    # non-fused paths edge-pad the first op's result before the second
    # op); computing `mid` from replicated input differs there. Clamp the
    # out-of-image ring of `mid` to its edge row/column (2r selects each
    # axis — r is 1-2 for every reference strel).
    gy = (jax.lax.broadcasted_iota(jnp.int32, mid.shape, 0)
          + i * tile - _HALO_R2)
    gx = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 1) - _HALO_C
    for k in range(1, ry + 1):
        mid = jnp.where(gy == -k, jnp.roll(mid, -k, axis=0), mid)
        mid = jnp.where(gy == h - 1 + k, jnp.roll(mid, k, axis=0), mid)
    for k in range(1, rx + 1):
        mid = jnp.where(gx == -k, jnp.roll(mid, -k, axis=1), mid)
        mid = jnp.where(gx == w - 1 + k, jnp.roll(mid, k, axis=1), mid)
    # the second pass reads `mid` rows/cols within +-r of the output
    # region; the halo (_HALO_R rows, _HALO_C lanes) covers 2r of any
    # practical strel, and `mid` is valid everywhere except its outermost
    # r-ring (roll wrap), which the second op never reaches for outputs
    out = None
    for dy, dx in taps:
        t = mid
        if dy:
            t = jnp.roll(t, -dy, axis=0)
        if dx:
            t = jnp.roll(t, -dx, axis=1)
        out = t if out is None else op2(out, t)
    out_ref[0] = out[_HALO_R2:_HALO_R2 + tile,
                     _HALO_C:_HALO_C + w_pad].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("taps", "first_erode",
                                             "ry", "rx"))
def _morph2_pallas(img: jax.Array, taps: Tuple[Tuple[int, int], ...],
                   first_erode: bool, ry: int, rx: int) -> jax.Array:
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    bsz, h, w = img.shape
    tile = _tile_for(2 * len(taps), _ROW_TILE)
    hp = -(-h // tile) * tile
    w_pad = -(-w // 128) * 128
    x = jnp.pad(img, ((0, 0), (_HALO_R2, hp - h + _HALO_R2),
                      (_HALO_C, w_pad - w + _HALO_C)), mode="edge")
    kern = functools.partial(_kernel2, taps=taps, tile=tile, w_pad=w_pad,
                             first_erode=first_erode, ry=ry, rx=rx,
                             h=h, w=w)
    out = pl.pallas_call(
        kern,
        grid=(bsz, hp // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile, w_pad), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w_pad), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO_R2, w_pad + 2 * _HALO_C),
                       img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(x)
    out = out[:, :h, :w]
    return out[0] if squeeze else out


def morph2_pallas(img: jax.Array, strel: np.ndarray,
                  first_erode: bool) -> jax.Array:
    """Fused open (erode->dilate) / close (dilate->erode) in ONE Pallas
    pass — halves the HBM round trips + launch overhead of the two-kernel
    formulation (round-4 verdict item 4: close3 0.9x was two back-to-back
    launch-bound passes). Reference semantics: CompVMathMorph::process
    COMPV_MATH_MORPH_OP_TYPE_{OPEN,CLOSE}
    (base/math/compv_math_morph.cxx:69-250), REPLICATE border."""
    hh, ww = strel.shape
    ry, rx = hh // 2, ww // 2
    assert 2 * ry <= _HALO_R2 and 2 * rx <= _HALO_C, "strel exceeds halo"
    taps = tuple((dy - ry, dx - rx) for dy in range(hh) for dx in range(ww)
                 if strel[dy, dx])
    return _morph2_vmappable(taps, first_erode, ry, rx)(img)


@functools.lru_cache(maxsize=None)
def _morph2_vmappable(taps, first_erode, ry, rx):
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(img):
        return _morph2_pallas(img, taps, first_erode, ry, rx)

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        out = _morph2_pallas(flat, taps, first_erode, ry, rx)
        return out.reshape(lead + out.shape[-2:]), True

    return f
