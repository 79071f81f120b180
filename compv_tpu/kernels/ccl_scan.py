"""Connected-component label propagation — Pallas TPU kernels.

Re-design of the reference's PLSL (core/ccl/compv_core_ccl_lsl.cxx + SSE/
AVX/NEON asm, ~1.6k LoC: run-length + equivalence tables, inherently
sequential). TPU formulation: iterate {column-run min, row-run min + one
diagonal hop} to a fixpoint. The run mins are SEGMENTED Hillis-Steele scans
(log2(N) VPU roll/min steps, resetting at background) — one scan moves a
label across an entire run, so convergence is O(component "turns"), not
O(diameter). XLA's associative_scan / neighbor slicing lowers these ~100x
off roofline (relayout copies); these kernels keep every step in VMEM.

Layout contract: labels are float32 linear indices in a PADDED (Hp, Wp)
frame with a >= 1-pixel background margin (so lane/sublane rolls wrap into
background, never into real pixels). f32 holds indices exactly up to 2^24.
Background = BIG = Hp*Wp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_COL_TILE = 256   # lanes per colscan program
_ROW_TILE = 96    # rows per rowscan program (the strengthened sweep's
#                   scan temps stay live in Mosaic's scoped VMEM; 96 rows
#                   keeps peak ~14 MB at 1280-lane frames)
_HALO_R = 8       # rowscan halo (1 needed for the diagonal hop)


def _seg_scan(v, g, axis, size, reverse, pos):
    """Segmented min-scan along `axis` via log-step roll/min in VMEM.
    v: values (BIG at background), g: boundary flags as f32 {0,1} (1 at
    background — Mosaic cannot roll i1 masks), pos: iota along `axis` for
    wrap masking."""
    k = 1
    while k < size:
        shift = -k if reverse else k
        vk = jnp.roll(v, shift, axis=axis)
        gk = jnp.roll(g, shift, axis=axis)
        wrapped = (pos >= size - k) if reverse else (pos < k)
        gk = jnp.where(wrapped, 1.0, gk)
        v = jnp.where(g > 0, v, jnp.minimum(v, vk))
        g = jnp.maximum(g, gk)
        k *= 2
    return v


def _colscan_kernel(in_ref, out_ref, flag_ref, *, hp, big):
    v = in_ref[:]
    g = jnp.where(v >= big, 1.0, 0.0)
    pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)

    fwd = _seg_scan(v, g, 0, hp, False, pos)
    bwd = _seg_scan(v, g, 0, hp, True, pos)
    out = jnp.minimum(fwd, bwd)
    # (adding extra in-kernel passes here OOMs scoped VMEM: Mosaic keeps
    # ~all scan temps live — 39.8 MB at 3 passes on a 1280^2 frame,
    # found on-chip 2026-08-20; the strengthened sweep lives in the
    # rowscan kernel instead, whose row-tile is shrinkable)
    out_ref[:] = out
    # convergence flag computed in VMEM: the XLA `any(new != lbl)` frame
    # compare cost 2 of the 6 frame-traffics of every sweep
    ch = jnp.sum(jnp.where(out != v, 1.0, 0.0))
    flag_ref[:] = jnp.zeros_like(flag_ref) + ch


def _rowscan_kernel(in_hbm, out_ref, flag_ref, scratch, sem, *, tile, wp,
                    big, connectivity):
    i = pl.program_id(0)
    rows = tile + 2 * _HALO_R
    dma = pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * tile, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    v0 = scratch[:]
    v = v0
    fgm = v < big
    g = jnp.where(v0 >= big, 1.0, 0.0)
    pos = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    posr = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    rows_tot = tile + 2 * _HALO_R

    def bandcol(x):
        """Band-local column pass (full columns handled by the colscan
        kernel; this propagates within the tile+halo rows for free)."""
        fwd = _seg_scan(x, g, 0, rows_tot, False, posr)
        bwd = _seg_scan(x, g, 0, rows_tot, True, posr)
        return jnp.minimum(fwd, bwd)

    def diag(x):
        if connectivity != 8:
            return x
        m = x
        for dy in (-1, 1):
            for dx in (-1, 1):
                t = jnp.roll(jnp.roll(x, -dy, axis=0), -dx, axis=1)
                m = jnp.minimum(m, t)
        return jnp.where(fgm, m, x)

    def rowpass(x):
        fwd = _seg_scan(x, g, 1, wp, False, pos)
        bwd = _seg_scan(x, g, 1, wp, True, pos)
        return jnp.minimum(fwd, bwd)

    # ONE strengthened local sweep per launch: diag, full row scan,
    # diag, then a band-local column scan — all in VMEM. ORDER matters:
    # the preceding colscan kernel just finished a full vertical pass,
    # so the extra vertical pass must come AFTER the horizontal one to
    # flood the newly-acquired row minima vertically within the band
    # (vertical-first duplicated the colscan and bought nothing,
    # measured on-chip 2026-08-20). Extra min-propagation never changes
    # the fixpoint. (TWO local iterations OOM'd scoped VMEM — Mosaic
    # keeps every pass's scan temps live; one at a 96-row tile fits.)
    out = bandcol(diag(rowpass(diag(v))))
    out_ref[:] = out[_HALO_R:_HALO_R + tile]
    ch = jnp.sum(jnp.where(
        out[_HALO_R:_HALO_R + tile] != v0[_HALO_R:_HALO_R + tile],
        1.0, 0.0))
    flag_ref[:] = jnp.zeros_like(flag_ref) + ch


def _colscan(lbl: jax.Array, big: float):
    hp, wp = lbl.shape
    n_prog = wp // _COL_TILE
    kern = functools.partial(_colscan_kernel, hp=hp, big=big)
    return pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec((hp, _COL_TILE), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((hp, _COL_TILE), lambda j: (0, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((n_prog * 8, 128), jnp.float32)],
        interpret=interpret_mode(),
    )(lbl)


def _rowscan(lbl: jax.Array, big: float, connectivity: int):
    hp, wp = lbl.shape
    n_prog = hp // _ROW_TILE
    x = jnp.pad(lbl, ((_HALO_R, _HALO_R), (0, 0)), constant_values=big)
    kern = functools.partial(_rowscan_kernel, tile=_ROW_TILE, wp=wp, big=big,
                             connectivity=connectivity)
    return pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((_ROW_TILE, wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((n_prog * 8, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((_ROW_TILE + 2 * _HALO_R, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret_mode(),
    )(x)


@functools.partial(jax.jit,
                   static_argnames=("connectivity", "max_sweeps"))
def label_pallas(binary: jax.Array, connectivity: int = 8,
                 max_sweeps: int = 1024, init: jax.Array = None) -> jax.Array:
    # max_sweeps is a safety bound only — the while_loop exits at the
    # fixpoint. 64 was too low: a snaking component with >64 "turns"
    # (e.g. 3.7k-px squiggles in random-noise images) stopped unconverged
    # and silently split into several labels (caught in round 2 by
    # differential tests against the tiled union-merge path).
    """(H, W) int32 labels, same contract as features/ccl.label: foreground
    pixels share their component's min linear index; background = H*W."""
    h, w = binary.shape
    # >= 1-px background margin so rolls wrap into background; row count a
    # _ROW_TILE multiple for the rowscan grid, lanes a _COL_TILE multiple
    hp = -(-(h + 2) // _ROW_TILE) * _ROW_TILE
    wp = -(-(w + 2) // _COL_TILE) * _COL_TILE
    big = float(hp * wp)
    fg = jnp.pad(binary > 0, ((1, hp - h - 1), (1, wp - w - 1)))
    idx = (jnp.arange(hp * wp, dtype=jnp.int32).reshape(hp, wp)
           .astype(jnp.float32))
    lbl0 = jnp.where(fg, idx, big)
    if init is not None:
        # warm start: init holds UNPADDED-space labels from a previous call
        # (nested-mask MSER sweep / multigrid seed); remap into padded
        # coords; "no seed" (>= h*w) maps to BIG, not a real index
        r = init.astype(jnp.int32)
        pr = jnp.where(r < h * w, (r // w + 1) * wp + (r % w + 1),
                       jnp.int32(hp * wp))
        pr = jnp.pad(pr.astype(jnp.float32), ((1, hp - h - 1),
                                              (1, wp - w - 1)),
                     constant_values=big)
        lbl0 = jnp.where(fg, jnp.minimum(lbl0, pr), big)

    def body(c):
        lbl, _, it = c
        mid, f1 = _colscan(lbl, big)
        new, f2 = _rowscan(mid, big, connectivity)
        # changed == any(new != lbl): each kernel flags its own in/out
        # delta in VMEM, so no full-frame XLA compare is needed
        changed = (jnp.max(f1) + jnp.max(f2)) > 0
        return new, changed, it + 1

    def cond(c):
        return c[1] & (c[2] < max_sweeps)

    lbl, _, _ = jax.lax.while_loop(
        cond, body, (lbl0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))

    # back to unpadded linear indices (row-major order is preserved by the
    # padded->unpadded map, so the min-index root is the same pixel)
    r = lbl[1:h + 1, 1:w + 1].astype(jnp.int32)
    fgc = r < jnp.int32(hp * wp)
    rows = r // wp - 1
    cols = r % wp - 1
    return jnp.where(fgc, rows * w + cols, h * w).astype(jnp.int32)
