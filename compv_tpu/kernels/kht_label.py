"""KHT tile-local edge-string labeling — Pallas TPU kernel.

The KHT front phase labels edge strings INSIDE tile*tile cells (features/
hough_kht._tile_local_label; reference analogue: the string linking +
subdivision of compv_core_feature_houghkht.cxx:207+, redesigned as
bounded min-label propagation with tile walls). The XLA fori_loop runs
`iters` full-frame passes through HBM — 0.49 ms of the 1.19 ms KHT row
(profiled 2026-08-20). Here every iteration happens on a VMEM-resident
row band: band height is a multiple of the tile size, so tile walls
align with band edges and NO halo is needed — vertical propagation
across a band edge is forbidden by the walls anyway. One HBM read + one
write for all iterations.

Bit-identical to the XLA loop: same synchronous 8-neighbor min update,
same iteration count.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_BAND = 64          # rows per grid step; must be a multiple of `tile`


def _kernel(in_ref, out_ref, *, iters, tile, big):
    lbl = in_ref[0]
    shape = lbl.shape
    rws = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ly = rws % tile     # band height % tile == 0: local y is band-relative
    lx = cols % tile
    fg = lbl < big

    walls = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            ok = None
            if dy == 1:
                ok = ly < tile - 1
            elif dy == -1:
                ok = ly > 0
            if dx == 1:
                c = lx < tile - 1
                ok = c if ok is None else (ok & c)
            elif dx == -1:
                c = lx > 0
                ok = c if ok is None else (ok & c)
            walls[(dy, dx)] = ok

    v = lbl
    for _ in range(iters):
        colr = {dx: (jnp.roll(v, -dx, axis=1) if dx else v)
                for dx in (-1, 0, 1)}
        m = v
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                t = (jnp.roll(colr[dx], -dy, axis=0) if dy else colr[dx])
                m = jnp.minimum(m, jnp.where(walls[(dy, dx)], t, big))
        v = jnp.where(fg, m, big)
    out_ref[0] = v


@functools.partial(jax.jit, static_argnames=("iters", "tile", "big"))
def tile_label_pallas(lbl0: jax.Array, iters: int, tile: int,
                      big: int) -> jax.Array:
    """Iterate the walled 8-neighbor min-label update `iters` times.
    lbl0: (hh, ww) i32 initial labels (background == big), hh % tile == 0.
    Returns the propagated labels, identical to the XLA fori_loop."""
    hh, ww = lbl0.shape
    assert _BAND % tile == 0 and hh % tile == 0
    hp = -(-hh // _BAND) * _BAND
    wp = -(-ww // 128) * 128
    x = jnp.pad(lbl0, ((0, hp - hh), (0, wp - ww)), constant_values=big)
    # padding columns: lane rolls wrap into them, but their labels are
    # `big` (never a min) and wall masks are computed on padded coords,
    # so wrapped values never cross a tile wall into real pixels
    kern = functools.partial(_kernel, iters=iters, tile=tile, big=big)
    out = pl.pallas_call(
        kern,
        grid=(hp // _BAND,),
        in_specs=[pl.BlockSpec((1, _BAND, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _BAND, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, hp, wp), jnp.int32),
        interpret=interpret_mode(),
    )(x[None])
    return out[0, :hh, :ww]
