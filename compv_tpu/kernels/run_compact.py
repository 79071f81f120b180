"""Run-table compaction — Pallas TPU kernel.

CCL / MSER component extraction needs the per-row runs of a labeled map
as a flat, root-sorted table (features/ccl.py `_sorted_run_table`,
features/mser.py `_component_table`). The XLA formulation sorts the FULL
map with sentinel keys — every pixel is a sort element, 1.33M x 3
operands ~= 3.1 ms on v5e (profiled 2026-08-19) even though only ~100k
run starts are real. Here a VMEM butterfly compacts each grid chunk's
run starts into (root, packed start<<11|len) pairs and DMAs them to a
1024-element-aligned offset (offsets precomputed in one cheap fused XLA
pre-pass over the start mask), so the sort that follows runs on
max_runs + slack elements x 2 operands — ~12x less sort traffic.

Packing bound: start index < 2^21 and run length <= 2047, i.e. images up
to ~2.1 Mpx with width <= 2047 (FullHD included); callers fall back to
the XLA path beyond that.

Reference analogue: the RLC/LEA run table the reference builds during
PLSL labeling (core/ccl/compv_core_ccl_lsl.cxx) — rebuilt here from the
dense label map because labeling itself is a fused fixpoint.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_CR = 512           # chunk rows (of 128 lanes) compacted per grid step.
# Bigger chunks shrink the sort that follows: each chunk's writes round
# up to a 1024-element block, so slack = n_chunks blocks — at 64 rows the
# 1122x1182 text map had 176 chunks (= 180k sentinel slack on a 262k
# table, the round-4 ccl_extract sort's real size); at 512 rows it is 22.
_LANES = 128


def pack_fits(h: int, w: int) -> bool:
    """True when (start << 11 | len) fits an i32 for this image."""
    return h * w < (1 << 21) and w <= 2047


def _flatroll(v, b, lanes):
    """Roll a (R, L) block by -b positions in row-major FLAT order."""
    q, m = divmod(b, lanes)
    if m == 0:
        return jnp.roll(v, -q, axis=0) if q else v
    a = jnp.roll(v, -m, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    lo = jnp.roll(a, -q, axis=0) if q else a
    hi = jnp.roll(a, -(q + 1), axis=0)
    return jnp.where(cols < lanes - m, lo, hi)


def _flatroll_back1(v):
    """Previous element in row-major flat order (garbage at position 0)."""
    a = jnp.roll(v, 1, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(cols > 0, a, jnp.roll(a, 1, axis=0))


def _kernel(offs, nblk, lbl_hbm, root_out, pack_out, sroot, spack, sem,
            *, rows, halo, n, w, wp):
    c = pl.program_id(0)
    t = 1 + rows + halo             # 1 back-halo row + chunk + fwd halo
    dma = pltpu.make_async_copy(
        lbl_hbm.at[pl.ds(c * rows, t), :], sroot, sem)
    dma.start()
    dma.wait()
    lbl = sroot[:]                  # (t, 128) i32; sroot doubles as scratch
    shape = lbl.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rws = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    # global flat position in the PADDED (hp, wp) map; the block's first
    # row is the back halo (callers prepend one background row)
    pos = (c * rows + rws - 1) * _LANES + cols

    fg = (lbl < n).astype(jnp.int32)
    # a run = maximal span of CONSECUTIVE EQUAL labels: for CCL maps this
    # equals bg-delimited foreground spans (row-consecutive fg pixels are
    # connected, hence same root), and it additionally lets tile-local
    # labelings (hough_kht piece ids) route through this kernel — their
    # runs split at tile walls where the label changes
    leftv = _flatroll_back1(lbl)
    valid_row = (rws >= 1) & (rws < 1 + rows)
    start = (fg > 0) & ((leftv != lbl) | (pos == 0)) & valid_row

    # run length: suffix segmented sum of fg along flat order, stopping
    # where the NEXT label differs (a run never crosses an original row:
    # wp > w keeps >= 1 background pad column at every row end). Forward
    # halo covers the longest run (w) plus its terminator.
    nextv = _flatroll(lbl, 1, _LANES)
    v = fg
    f = (nextv != lbl).astype(jnp.int32)
    d = 1
    while d < (halo + 1) * _LANES:
        vs = _flatroll(v, d, _LANES)
        fs = _flatroll(f, d, _LANES)
        guard = rws < t - (d + _LANES - 1) // _LANES   # stay in block
        take = guard & (f == 0)
        v = v + jnp.where(take, vs, 0)
        f = f | jnp.where(guard, fs, 0)
        d <<= 1
    runlen = v

    # original-coordinate start index and the (s << 11 | len) payload.
    # pos // wp via f32: Mosaic vector integer division is unsupported;
    # with pos < 2^23 and the +0.5 nudge the f32 quotient floor is exact
    # (margin 0.5/wp >> 1 ulp at these magnitudes)
    posf = jnp.maximum(pos, 0).astype(jnp.float32)
    q = jnp.floor((posf + 0.5) * (1.0 / wp)).astype(jnp.int32)
    s_orig = q * w + (jnp.maximum(pos, 0) - q * wp)
    # * 2048 == << 11 (low bits zero, runlen < 2048 rides the + exactly)
    packed = s_orig * 2048 + runlen
    root_v = jnp.where(start, lbl, n)
    pack_v = jnp.where(start, packed, 0)

    # global rank of each start within the chunk: in-row prefix (lane
    # scan) + cross-row exclusive prefix via a tiny lower-tri MXU matmul
    si = start.astype(jnp.int32)
    inc = si
    d = 1
    while d < _LANES:
        inc = inc + jnp.where(cols >= d, jnp.roll(inc, d, axis=1), 0)
        d <<= 1
    row_tot = jnp.sum(si, axis=1, keepdims=True).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    tril = (ii > jj).astype(jnp.float32)
    ex_row = jnp.dot(tril, row_tot,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    rank = ex_row + inc - si

    # LSB-first butterfly over the flat block: shift = flatpos - rank is
    # monotone non-decreasing over selected elements, so routing one bit
    # per stage is collision-free (see features/fast.py _compact_rows)
    lpos = rws * _LANES + cols
    rsh = jnp.where(start, lpos - rank, 0)
    yr, yp = root_v, pack_v
    b = 1
    while b < t * _LANES:
        cr = _flatroll(rsh, b, _LANES)
        car = _flatroll(yr, b, _LANES)
        cap_ = _flatroll(yp, b, _LANES)
        move_in = (car != n) & ((cr & b) != 0) & (lpos + b < t * _LANES)
        moved_out = (yr != n) & ((rsh & b) != 0)
        yr = jnp.where(move_in, car, jnp.where(moved_out, n, yr))
        yp = jnp.where(move_in, cap_, jnp.where(moved_out, 0, yp))
        rsh = jnp.where(move_in, cr - b, jnp.where(moved_out, 0, rsh))
        b <<= 1
    sroot[:] = yr
    spack[:] = yp

    # DMA exactly ceil(count/1024) 8-row blocks to this chunk's region.
    # Statically unrolled (max starts/chunk = rows*128/2 -> <= 4 blocks)
    # with pl.when guards — no dynamic trip counts for Mosaic to refuse.
    off8 = offs[c] * 8
    nb = nblk[c]
    max_blocks = (rows * _LANES // 2 + 1023) // 1024
    for k in range(max_blocks):
        @pl.when(k < nb)
        def _(k=k):
            r0 = k * 8
            cp1 = pltpu.make_async_copy(
                sroot.at[pl.ds(r0, 8), :],
                root_out.at[pl.ds(off8 + r0, 8), :], sem)
            cp1.start()
            cp1.wait()
            cp2 = pltpu.make_async_copy(
                spack.at[pl.ds(r0, 8), :],
                pack_out.at[pl.ds(off8 + r0, 8), :], sem)
            cp2.start()
            cp2.wait()


@functools.partial(jax.jit, static_argnames=("n", "w", "wp", "max_runs"))
def run_table_compact(labels_p: jax.Array, n: int, w: int, wp: int,
                      max_runs: int):
    """Compact + root-sort the run table of a padded label map.

    labels_p: (hp, wp) i32, background/padding >= n, wp % 128 == 0 and
    wp > w (every original row ends with >= 1 background pad column).
    Returns (g_root, g_s, g_ln, run_count) exactly like the XLA
    `ccl._sorted_run_table` (g_* are (max_runs,), root-sorted ascending,
    sentinel-padded with root = n). When run_count > max_runs the table
    is truncated (callers flag via run_count, docs/API.md convention).
    """
    hp = labels_p.shape[0]
    assert labels_p.shape[1] == wp and wp % _LANES == 0 and wp > w
    if hp == 0 or max_runs == 0:    # degenerate map: empty sentinel table
        mr = max(max_runs, 1)
        return (jnp.full((mr,), n, jnp.int32), jnp.full((mr,), n, jnp.int32),
                jnp.ones((mr,), jnp.int32), jnp.zeros((), jnp.int32))
    halo = -(-(w + 1) // _LANES) + 1
    # keep the block row count (1 + _CR + halo) a multiple of 8: Mosaic
    # sublane tiling (8 for i32) — unaligned scratch/DMA shapes fault
    halo += (-(1 + _CR + halo)) % 8
    r_total = hp * wp // _LANES
    n_chunks = -(-r_total // _CR)
    # one background back-halo row on top; forward halo + chunk padding
    flat = labels_p.reshape(r_total, _LANES)
    flat = jnp.pad(flat, ((1, n_chunks * _CR - r_total + halo), (0, 0)),
                   constant_values=n)

    # ---- XLA pre-pass: per-chunk start counts -> aligned block offsets
    fg2 = labels_p < n
    left2v = jnp.pad(labels_p, ((0, 0), (1, 0)),
                     constant_values=n)[:, :wp]
    start2 = (fg2 & (left2v != labels_p)).reshape(-1).astype(jnp.int32)
    start2 = jnp.pad(start2, (0, n_chunks * _CR * _LANES - r_total * _LANES))
    counts = jnp.sum(start2.reshape(n_chunks, _CR * _LANES), axis=1)
    run_count = jnp.sum(counts)
    blocks = -(-counts // 1024)
    cap_blocks = -(-max_runs // 1024) + n_chunks
    offs = jnp.cumsum(blocks) - blocks
    # overflow clamp: writes stay in bounds; results garbage but flagged
    # by run_count > max_runs (docs/API.md failure convention)
    offs = jnp.minimum(offs, cap_blocks - jnp.maximum(blocks, 1))
    offs = jnp.maximum(offs, 0).astype(jnp.int32)

    t = 1 + _CR + halo
    cap_rows = cap_blocks * 8
    kern = functools.partial(_kernel, rows=_CR, halo=halo, n=n, w=w,
                             wp=wp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[pltpu.VMEM((t, _LANES), jnp.int32),
                        pltpu.VMEM((t, _LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    root_c, pack_c = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap_rows, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((cap_rows, _LANES), jnp.int32)],
        interpret=interpret_mode(),
    )(offs, blocks.astype(jnp.int32), flat)

    # slots past the last written block are uninitialized -> sentinel
    total = (offs[-1] + jnp.maximum(blocks[-1], 0)) * 1024
    gpos = jnp.arange(cap_rows * _LANES, dtype=jnp.int32)
    root_f = jnp.where(gpos < total, root_c.reshape(-1), n)
    pack_f = jnp.where(gpos < total, pack_c.reshape(-1), 0)
    g_root, g_pack = jax.lax.sort((root_f, pack_f), num_keys=1)
    g_root, g_pack = g_root[:max_runs], g_pack[:max_runs]
    sentinel = g_root >= n
    g_s = jnp.where(sentinel, n,
                    jax.lax.shift_right_logical(g_pack, 11))
    g_ln = jnp.where(sentinel, 1, g_pack & 2047)
    return g_root, g_s, g_ln, run_count.astype(jnp.int32)
