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
    i = pl.program_id(0)
    rows = tile + 2 * _HALO_R
    dma = pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * tile, rows), :], scratch, sem)
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
    out_ref[:] = out[_HALO_R:_HALO_R + tile,
                     _HALO_C:_HALO_C + w_pad].astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("taps", "is_erode"))
def _morph_pallas(img: jax.Array, taps: Tuple[Tuple[int, int], ...],
                  is_erode: bool) -> jax.Array:
    h, w = img.shape
    tile = _ROW_TILE
    hp = -(-h // tile) * tile
    w_pad = -(-w // 128) * 128
    # REPLICATE border (reference default); the extra alignment padding
    # also replicates, so rolled taps read clamped values
    x = jnp.pad(img, ((_HALO_R, hp - h + _HALO_R),
                      (_HALO_C, w_pad - w + _HALO_C)), mode="edge")
    kern = functools.partial(_kernel, taps=taps, tile=tile, w_pad=w_pad,
                             is_erode=is_erode)
    out = pl.pallas_call(
        kern,
        grid=(hp // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile, w_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w_pad), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO_R, w_pad + 2 * _HALO_C), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(x)
    return out[:h, :w]


def morph_pallas(img: jax.Array, strel: np.ndarray,
                 is_erode: bool) -> jax.Array:
    """Erode (min) / dilate (max) with a flat strel over uint8."""
    hh, ww = strel.shape
    ry, rx = hh // 2, ww // 2
    taps = tuple((dy - ry, dx - rx) for dy in range(hh) for dx in range(ww)
                 if strel[dy, dx])
    return _morph_pallas(img, taps, is_erode)
