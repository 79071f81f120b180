"""Segmented multi-stat scan — Pallas TPU kernel.

CCL component extraction and MSER aggregate per-component statistics from
a root-sorted run table with ONE segmented inclusive scan carrying ~10
stat arrays (features/ccl.py `_seg_scan_multi`). `lax.associative_scan`
materializes every one of its ~2*log2(N) sweeps through HBM for all
carried arrays — measured 3.56 ms for 10 stats at N=262144 on v5e
(2026-08-19), ~30x the compulsory traffic (10 MB in + 10 MB out).

This kernel runs the textbook two-level construction entirely in VMEM:

  level 1  segmented Hillis-Steele along lanes (7 steps),
  level 2  segmented scan of row tails along sublanes (log2(rows) steps),
  carry    one running value per stat rides an SMEM accumulator across
           the sequential grid (chunks are visited in order on TPU).

One HBM read + one write per stat. Reference analogue: the per-component
feature accumulation of CompVConnectedComponentLabelingResultLSLImpl
(core/ccl/compv_core_ccl_lsl_result.cxx) — redesigned as a scan because
TPU has no cheap scatter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_LANES = 128
_ROWS = 256          # chunk = _ROWS * _LANES = 32k elements
_BIG = 3.0e38


def _combine(kind, a, b):
    if kind == "s":
        return a + b
    if kind == "m":
        return jnp.minimum(a, b)
    return jnp.maximum(a, b)


def _identity(kind):
    return 0.0 if kind == "s" else (_BIG if kind == "m" else -_BIG)


def _kernel(new_ref, *refs, kinds, rows):
    c = pl.program_id(0)
    n_st = len(kinds)
    in_refs, out_refs = refs[:n_st], refs[n_st:2 * n_st]
    acc = refs[2 * n_st]      # SMEM scratch (positional after outputs)

    @pl.when(c == 0)
    def _():
        for k, kind in enumerate(kinds):
            acc[k] = _identity(kind)

    # flags stay i32 throughout: Mosaic cannot roll i1 masks (CLAUDE.md
    # gotcha 3) — bools exist only transiently as `where` conditions
    new = new_ref[0]                           # (R, L) i32 0/1
    vals = [r[0] for r in in_refs]
    shape = new.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rws = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    # ---- level 1: segmented inclusive scan along lanes ----------------
    f = new
    d = 1
    while d < _LANES:
        guard = cols >= d
        fs = jnp.roll(f, d, axis=1)
        take = guard & (f == 0)
        vals = [jnp.where(take, _combine(k, v, jnp.roll(v, d, axis=1)),
                          v)
                for k, v in zip(kinds, vals)]
        f = f | jnp.where(guard, fs, 0)
        d <<= 1
    f1 = f     # nonzero <=> a `new` in [row_start, i]

    # ---- level 2: segmented scan of row tails along sublanes ----------
    last = cols == _LANES - 1
    # row tail (broadcast along lanes) and row flag, shifted down one row
    # so each row sees the combine of the rows ABOVE it (exclusive)
    rt = [jnp.broadcast_to(
        jnp.max(jnp.where(last, v, -_BIG), axis=1, keepdims=True)
        if k != "s" else
        jnp.sum(jnp.where(last, v, 0.0), axis=1, keepdims=True), shape)
        for k, v in zip(kinds, vals)]
    fr = jnp.broadcast_to(
        jnp.max(jnp.where(last, f1, 0), axis=1, keepdims=True), shape)
    fr = jnp.where(fr > 0, 1, 0)
    sr = [jnp.where(rws > 0, jnp.roll(v, 1, axis=0), _identity(k))
          for k, v in zip(kinds, rt)]
    g = jnp.where(rws > 0, jnp.roll(fr, 1, axis=0), 0)
    d = 1
    while d < rows:
        guard = rws >= d
        fs = jnp.roll(g, d, axis=0)
        take = guard & (g == 0)
        sr = [jnp.where(take, _combine(k, v, jnp.roll(v, d, axis=0)), v)
              for k, v in zip(kinds, sr)]
        g = g | jnp.where(guard, fs, 0)
        d <<= 1
    # sr[r] = combine of row tails of rows above r (within segment);
    # g[r] nonzero <=> a row boundary strictly above r
    vals = [jnp.where(f1 > 0, v, _combine(k, v, s))
            for k, v, s in zip(kinds, vals, sr)]
    gg = (f1 | g) > 0   # any `new` in [chunk_start, element]

    # ---- cross-chunk carry --------------------------------------------
    lastel = last & (rws == rows - 1)
    for k, (kind, v) in enumerate(zip(kinds, vals)):
        cv = acc[k]
        v = jnp.where(gg, v, _combine(kind, v, cv))
        if kind == "s":
            t = jnp.sum(jnp.where(lastel, v, 0.0))
        elif kind == "m":
            t = jnp.min(jnp.where(lastel, v, _BIG))
        else:
            t = jnp.max(jnp.where(lastel, v, -_BIG))
        acc[k] = t
        out_refs[k][0] = v


@functools.partial(jax.jit, static_argnames=("kinds",))
def _seg_scan_pallas(new_i32: jax.Array, stats: tuple, kinds: str):
    n = new_i32.shape[0]
    chunk = _ROWS * _LANES
    npad = -(-n // chunk) * chunk
    if npad != n:
        new_i32 = jnp.pad(new_i32, (0, npad - n))
        stats = tuple(jnp.pad(s, (0, npad - n)) for s in stats)
    rr = npad // _LANES
    new2 = new_i32.reshape(1, rr, _LANES)
    st2 = [s.astype(jnp.float32).reshape(1, rr, _LANES) for s in stats]
    kern = functools.partial(_kernel, kinds=tuple(kinds), rows=_ROWS)
    blk = pl.BlockSpec((1, _ROWS, _LANES), lambda c: (0, c, 0))
    outs = pl.pallas_call(
        kern,
        grid=(rr // _ROWS,),
        in_specs=[blk] * (1 + len(stats)),
        out_specs=[blk] * len(stats),
        out_shape=[jax.ShapeDtypeStruct((1, rr, _LANES), jnp.float32)
                   for _ in stats],
        scratch_shapes=[pltpu.SMEM((len(stats),), jnp.float32)],
        interpret=interpret_mode(),
    )(new2, *st2)
    return tuple(o.reshape(-1)[:n] for o in outs)


def seg_scan_multi(sums, mins, maxs, new):
    """Drop-in for features/ccl._seg_scan_multi on the Pallas path:
    segmented inclusive scan (reset where `new`) of len-N 1-D f32 stats;
    `sums` accumulate, `mins`/`maxs` reduce. Returns them in argument
    order. Exact for integer-valued f32 stats (the combine order differs
    from associative_scan, which only matters beyond f32 integer range)."""
    kinds = "s" * len(sums) + "m" * len(mins) + "x" * len(maxs)
    return _seg_scan_pallas(new.astype(jnp.int32),
                            tuple(sums) + tuple(mins) + tuple(maxs), kinds)
