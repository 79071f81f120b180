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

_ROW_TILE = 72   # largest tile that fits scoped VMEM: the scheduler
#                  keeps ~121 B/element of scan temps live (measured
#                  from the 17.77M OOM at tile 96 x 1408 lanes), so
#                  (tile+8)*wp must stay under ~115k elements
_HALO_R = 4    # circle r=3 + NMS 1. The DMA row offsets stay 8-sublane
# aligned regardless of the halo (the tile start is i*_ROW_TILE into the
# halo-padded image); only the copy LENGTH carries the halo, so the
# minimal 4 works — 72 computed rows per 64 output vs 80 at halo 8
# (round-4 profile: the strengths kernel is 63.5 us/frame of the 142 us
# batched FAST total, so 10% less tree work is the single biggest lever)
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


def _window_tree(planes, n, take_min):
    """All 16 cyclic n-window mins (or maxes) of the plane list via the
    Gil-Werman two-block prefix/suffix construction: 2x7 suffix folds +
    2x7 prefix folds + 16 combines = 44 elementwise ops for n=9, vs 64
    for the log-step rolling tree. Returns the 16 per-start windows."""
    assert n == 9, "two-block construction is specialized to window 9"
    op = jnp.minimum if take_min else jnp.maximum
    # suffix mins within blocks [0..7] and [8..15]
    suf = list(planes)
    for i in range(6, -1, -1):
        suf[i] = op(planes[i], suf[i + 1])
        suf[8 + i] = op(planes[8 + i], suf[8 + i + 1])
    pre = list(planes)
    for i in range(1, 8):
        pre[i] = op(pre[i - 1], planes[i])
        pre[8 + i] = op(pre[8 + i - 1], planes[8 + i])
    # window s..s+8 (cyclic): suffix of own block + prefix into the next
    return ([op(suf[s], pre[8 + s]) for s in range(8)]
            + [op(suf[8 + s], pre[s]) for s in range(8)])


def _fold(planes, op):
    out = planes[0]
    for q in planes[1:]:
        out = op(out, q)
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
    # u8 -> i32 -> f32 -> BF16 (no direct u8 casts in Mosaic). The whole
    # segment test is EXACT in bf16: every intermediate is an integer in
    # [-256, 255] (8-bit significand holds integers to +-256 exactly;
    # the only values past 255 are post-threshold negatives, where only
    # the sign matters because relu clamps them to 0) — and bf16 packs
    # 2/lane on the VPU, ~2x the window-tree throughput (the tree was
    # ~75% of this kernel's 61 us/frame at f32, profiled 2026-08-20).
    p = (scratch[:].astype(jnp.int32).astype(jnp.float32)
         .astype(jnp.bfloat16))                            # (rows, wp)

    # Raw circle differences e[k] = circle[k] - p. The reference's
    # saturated u8 diffs relu(circle - min(p+t,255)) / relu(max(p-t,0) -
    # circle) (fast_dete.cxx:658-770) equal relu(e - t) / relu(-e - t)
    # EXACTLY for u8 inputs (case analysis on the saturation boundaries:
    # both sides are 0 whenever the clamp engages), and threshold/relu
    # commute with windowed min/max — so the arc trees run on e directly
    # and t folds out to two scalar subtracts at the end. Column shifts
    # are shared across the 16 planes (7 lane-shift copies; the 14 row
    # shifts are cheap sublane rotations).
    col = {dx: (jnp.roll(p, -dx, axis=1) if dx else p)
           for dx in (-3, -2, -1, 0, 1, 2, 3)}
    e = [(jnp.roll(col[dx], -dy, axis=0) if dy else col[dx]) - p
         for dx, dy in CIRCLE]

    if n == 9:
        mn = _window_tree(e, 9, take_min=True)
        sb = jnp.maximum(_fold(mn, jnp.maximum) - threshold, 0.0)
        mx = _window_tree(e, 9, take_min=False)
        sd = jnp.maximum(-_fold(mx, jnp.minimum) - threshold, 0.0)
    else:
        # n=12: log-step rolling windows (4 steps: 1,2,4,8 then +4)
        def windows(planes, op):
            m = list(planes)
            span = 1
            while span * 2 <= n:
                m = [op(m[k], m[(k + span) % 16]) for k in range(16)]
                span *= 2
            if span < n:
                m = [op(m[k], m[(k + n - span) % 16]) for k in range(16)]
            return m
        sb = jnp.maximum(
            _fold(windows(e, jnp.minimum), jnp.maximum) - threshold, 0.0)
        sd = jnp.maximum(
            -_fold(windows(e, jnp.maximum), jnp.minimum) - threshold, 0.0)
    # bf16 ends here: Mosaic rejects bf16 COMPARISONS ("Target does not
    # support this comparison", found on-chip 2026-08-20) — the NMS and
    # interior-mask compares below run in f32 (a small share of the ops)
    s = jnp.maximum(sb, sd).astype(jnp.float32)

    # interior mask in global image coordinates (3-px frame invalid,
    # fast_dete.cxx computes rows [3, h-3) only; padding likewise zeroed)
    gy = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
          + i * tile - _HALO_R)
    gx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    interior = ((gy >= 3) & (gy < h - 3) & (gx >= 3) & (gx < w - 3))
    s = jnp.where(interior, s, 0)

    if nms:
        # 3x3 NMS: ties suppress (fast_dete.cxx:773-815). SEPARABLE
        # 8-neighbor max: horizontal row-triple max once, shifted up and
        # down for the 6 off-row neighbors, plus the left/right pair —
        # 4 rolls + 5 maxes vs the 8-roll/7-max direct form
        sl = jnp.roll(s, 1, axis=1)
        sr = jnp.roll(s, -1, axis=1)
        r3 = jnp.maximum(jnp.maximum(sl, sr), s)
        nmax = jnp.maximum(
            jnp.maximum(jnp.roll(r3, 1, axis=0), jnp.roll(r3, -1, axis=0)),
            jnp.maximum(sl, sr))
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
    # VMEM-adaptive row tile: ~121 B/element of live scan temps (see
    # _ROW_TILE note); budget keeps peak ~14 MB at any width
    wp = -(-w // 128) * 128
    tile = min(_ROW_TILE, max(8, (115_000 // wp - 2 * _HALO_R) // 8 * 8))
    hp = -(-h // tile) * tile
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
