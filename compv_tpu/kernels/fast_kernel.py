"""FAST-9/12 strengths + NMS — fused Pallas TPU kernel.

TPU-native re-design of the reference's hottest kernel group
(core/features/fast/compv_core_feature_fast_dete.cxx:103-868 + ~3.4k LoC of
SSE2/AVX2/NEON asm across 10 files): the branchy per-pixel segment test
becomes a dense VPU program. One row-tile of the image is DMA'd to VMEM once;
the 16 Bresenham-circle neighbor planes, the cyclic arc-min strength
(fast_dete.cxx:708-716 semantics) and the 3x3 NMS (fast_dete.cxx:773-815)
all happen from VMEM, writing a single u8 strengths map back to HBM. The
jnp formulation (features/fast.py) materializes the 16-plane stack through
HBM; this kernel keeps it on-chip.

The two polarity stacks (brighter/darker) share one 16-plane VMEM scratch,
processed sequentially to halve peak VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode
from ..features.fast import CIRCLE

_ROW_TILE = 64
_HALO_R = 16   # u8-sublane-aligned halo (needs only 4: circle r=3 + NMS 1;
# 16 keeps tile+2*halo = 96 a multiple of the 32-sublane u8 memref tile)
# No column halo at all: jnp.roll wrap-around along lanes only contaminates
# the 3 columns nearest the tile edge, and those are zeroed by the interior
# mask (gx < 3 or gx >= w-3) before NMS — the wrapped values never reach a
# kept output. Dropping the old 128-lane halo on each side cuts the
# computed area ~1.7x at HD.


def _roll2(v, dy, dx):
    if dy:
        v = jnp.roll(v, -dy, axis=0)
    if dx:
        v = jnp.roll(v, -dx, axis=1)
    return v


def _windowed_strength(planes, n):
    """max over the 16 arc starts of (min over n consecutive planes).
    planes: list of 16 (R, C) arrays. Log-step rolling min, expressed as
    elementwise folds over the plane list (Mosaic: no unsigned axis
    reductions, and per-plane buffers schedule better than a 3-D stack)."""
    m = list(planes)
    span = 1
    while span * 2 <= n:
        m = [jnp.minimum(m[k], m[(k + span) % 16]) for k in range(16)]
        span *= 2
    if span < n:
        m = [jnp.minimum(m[k], m[(k + n - span) % 16]) for k in range(16)]
    out = m[0]
    for k in range(1, 16):
        out = jnp.maximum(out, m[k])
    return out


def _kernel(img_hbm, out_ref, scratch, sem, *, tile, wp, n, threshold,
            h, w, nms):
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile + 2 * _HALO_R
    dma = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * tile, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    p = scratch[:].astype(jnp.int32)           # (rows, wp)
    brighter = jnp.minimum(p + threshold, 255)
    darker = jnp.maximum(p - threshold, 0)

    # brighter diffs: relu(circle - (p + t)); darker: relu((p - t) - circle).
    # Planes are f32: Mosaic lowers vector min/max only for f32/i32, and f32
    # schedules best on the VPU; values stay exact (range 0..255).
    db = [jnp.maximum(_roll2(p, dy, dx) - brighter, 0).astype(jnp.float32)
          for dx, dy in CIRCLE]
    sb = _windowed_strength(db, n)
    dd = [jnp.maximum(darker - _roll2(p, dy, dx), 0).astype(jnp.float32)
          for dx, dy in CIRCLE]
    sd = _windowed_strength(dd, n)
    s = jnp.maximum(sb, sd)

    # interior mask in global image coordinates (3-px frame invalid,
    # fast_dete.cxx computes rows [3, h-3) only; padding likewise zeroed)
    gy = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
          + i * tile - _HALO_R)
    gx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    interior = ((gy >= 3) & (gy < h - 3) & (gx >= 3) & (gx < w - 3))
    s = jnp.where(interior, s, 0)

    if nms:
        # 3x3 NMS: ties suppress (fast_dete.cxx:773-815)
        nmax = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                t = _roll2(s, dy, dx)
                nmax = t if nmax is None else jnp.maximum(nmax, t)
        s = jnp.where((s > 0) & (nmax < s), s, 0)

    # f32 -> i32 -> u8 (no direct f32->u8 cast in Mosaic)
    out_ref[0] = s[_HALO_R:_HALO_R + tile, :].astype(
        jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("threshold", "n", "nms"))
def fast_strengths_pallas(img: jax.Array, threshold: int = 20, n: int = 9,
                          nms: bool = True) -> jax.Array:
    """FAST strengths map (NMS'd), one fused HBM pass. Accepts (H, W) or a
    batch (B, H, W) — the batch maps onto a second grid dimension (serving
    throughput; vmap cannot batch manual-DMA Pallas kernels)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    bsz, h, w = img.shape
    tile = _ROW_TILE
    hp = -(-h // tile) * tile
    wp = -(-w // 128) * 128
    x = jnp.pad(img, ((0, 0), (_HALO_R, hp - h + _HALO_R),
                      (0, wp - w)))
    kern = functools.partial(_kernel, tile=tile, wp=wp, n=n,
                             threshold=threshold, h=h, w=w, nms=nms)
    out = pl.pallas_call(
        kern,
        grid=(bsz, hp // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, tile, wp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _HALO_R, wp), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(x)
    out = out[:, :h, :w]
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=None)
def fast_strengths_vmappable(threshold: int, n: int, nms: bool):
    """A single-image strengths fn that jax.vmap routes to the BATCHED
    kernel (manual-DMA pallas_calls have no automatic batching rule)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(img):
        return fast_strengths_pallas(img, threshold, n, nms=nms)

    @f.def_vmap
    def _rule(axis_size, in_batched, img):
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        out = fast_strengths_pallas(flat, threshold, n, nms=nms)
        return out.reshape(lead + out.shape[-2:]), True

    return f
