"""FAST top-k selection + row compaction — Pallas TPU kernel.

The postlude of FAST (features/fast.py `_cutoff_select`) selects the
pixels above a histogram-derived strength cutoff (plus a prefix of the
ties at cutoff-1) and left-compacts each row's packed keys. The XLA
formulation runs the log2(W)-stage butterfly through HBM — every stage
re-reads and re-writes the full key map, ~96 us/frame at HD batch 8
(profiled 2026-08-19), which made the postlude cost ~1.5x the fused
strengths kernel itself. Here one VMEM-resident kernel does the
selection mask, the per-row tie budgeting AND all butterfly stages in a
single HBM read + write (~17 us/frame): the TPU grid is sequential, so
the global tie prefix rides an SMEM accumulator across row tiles, and
the in-tile row prefix is a lower-triangular MXU matmul.

Reference analogue: CompVInterestPoint::selectBest / nth_element
(core/features/fast/compv_core_feature_fast_dete.cxx:418) — redesigned
as cutoff selection (see features/fast.py for the exactness argument).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_TILE = 64


def _kernel(bounds, key_ref, out_ref, cnt_ref, acc, *, ww, pad_key,
            orig_w, spacing):
    b_ix = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[0] = 0

    sb = bounds[b_ix, 0]       # strict bound: key < sb <=> strength > c-1
    eb = bounds[b_ix, 1]       # tie bound: sb <= key < eb <=> str == c-1
    r = bounds[b_ix, 2]        # tie budget (k - #strict)
    key = key_ref[0]
    tile = key.shape[0]
    strict = key < sb
    eq = (key >= sb) & (key < eb)
    eqi = eq.astype(jnp.float32)
    row_tot = jnp.sum(eqi, axis=1, keepdims=True)            # (T, 1)
    # exclusive per-row prefix of tie counts within the tile: strict
    # lower-triangular one-hot on the MXU (tiny (T, T) @ (T, 1))
    ii = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    tril = (ii > jj).astype(jnp.float32)
    ex = jnp.dot(tril, row_tot, preferred_element_type=jnp.float32)
    ex_row = ex.astype(jnp.int32) + acc[0]                   # (T, 1)
    acc[0] = acc[0] + jnp.sum(row_tot).astype(jnp.int32)

    def prefix(v):
        """Inclusive per-row prefix sum (Hillis-Steele log-shift; the
        jnp.roll wraparound is masked by the column guard)."""
        inc = v
        bb = 1
        while bb < ww:
            inc = inc + jnp.where(cols >= bb, jnp.roll(inc, bb, axis=1), 0)
            bb <<= 1
        return inc

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, ww), 1)
    # EXACT tie cut: a tie is kept iff its global tie rank (rows before
    # this one via acc + rows above in the tile via the tril matmul +
    # ties within the row, ranked by FLAT INDEX) is under the budget —
    # so the caller's capacity is exactly k. Row-granular over-selection
    # (cap k + ww) was tried 2026-08-20 and is a net LOSS: it drops one
    # prefix pass here but pushes the caller's final packed sort past
    # the 2048 power-of-two (2000 + 640 pads to a 4096-wide bitonic),
    # costing ~16 us/frame against the ~5 saved.
    if spacing == 1:
        # unpooled map: column position == flat-index order within a row
        eqi32 = eq.astype(jnp.int32)
        eq_rank = prefix(eqi32) - eqi32
    else:
        # 2x2 min-pooled key map (nms_spaced): a pooled row interleaves
        # original rows 2g and 2g+1, so column position can INVERT
        # flat-index order between them (round-3 advisor finding, would
        # break the lax.top_k tie contract). Flat order within a pooled
        # row is: all even-original-row ties (in column order, since
        # orig col is monotone in pooled col) before all odd-row ties
        # (in column order) — rank the two parities separately, odd
        # ranks offset by the row's even-tie count. BOTH parity ranks
        # ride ONE packed prefix (even count << 16 | odd count; row
        # sums < 2^16), halving what was ~40% of this kernel's VPU ops
        # (round-4 profile: 35 -> ~21 us/frame at HD batch 8).
        idx = key & ((1 << 22) - 1)
        grow = (i * tile
                + jax.lax.broadcasted_iota(jnp.int32, (tile, ww), 0))
        odd = idx >= (spacing * grow + 1) * orig_w
        evi = (eq & ~odd).astype(jnp.int32)
        odi = (eq & odd).astype(jnp.int32)
        p = prefix((evi << 16) | odi)
        row_even = jnp.broadcast_to(p[:, ww - 1:ww] >> 16, (tile, ww))
        ev_ex = (p >> 16) - evi
        od_ex = (p & 0xFFFF) - odi
        eq_rank = jnp.where(odd, row_even + od_ex, ev_ex)
    sel = strict | (eq & (ex_row + eq_rank < r))
    y = jnp.where(sel, key, pad_key)

    vi = sel.astype(jnp.int32)
    inc = prefix(vi)
    rank = inc - vi
    cnt_ref[0] = jnp.broadcast_to(inc[:, ww - 1:ww], (tile, 128))

    # LSB-first butterfly: shift distances (col - rank) are monotone
    # non-decreasing along a row, so routing one bit per stage is
    # collision-free (see features/fast.py _compact_rows)
    rsh = jnp.where(sel, cols - rank, 0)
    b = 1
    while b < ww:
        cand = jnp.roll(y, -b, axis=1)
        cr = jnp.roll(rsh, -b, axis=1)
        move_in = (cand != pad_key) & ((cr & b) != 0) & (cols + b < ww)
        moved_out = (y != pad_key) & ((rsh & b) != 0)
        y = jnp.where(move_in, cand, jnp.where(moved_out, pad_key, y))
        rsh = jnp.where(move_in, cr - b, jnp.where(moved_out, 0, rsh))
        b <<= 1
    out_ref[0] = y


@functools.partial(jax.jit,
                   static_argnames=("pad_key", "orig_w", "spacing"))
def _select_compact_batched(key_p: jax.Array, bounds: jax.Array,
                            pad_key: int, orig_w: int, spacing: int):
    bsz, hh, ww = key_p.shape
    assert ww % 128 == 0, ww
    # the packed parity prefix ((evi << 16) | odi) needs per-row tie
    # counts < 2^16 — holds iff the row width does (advisor round-4)
    assert ww < (1 << 16), ww
    hp = -(-hh // _TILE) * _TILE
    if hp != hh:
        key_p = jnp.pad(key_p, ((0, 0), (0, hp - hh), (0, 0)),
                        constant_values=pad_key)
    kern = functools.partial(_kernel, ww=ww, pad_key=pad_key,
                             orig_w=orig_w, spacing=spacing)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, hp // _TILE),
        in_specs=[
            pl.BlockSpec((1, _TILE, ww), lambda b, i, *_: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _TILE, ww), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, _TILE, 128), lambda b, i, *_: (b, i, 0)),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    out, cnt = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, ww), jnp.int32),
            jax.ShapeDtypeStruct((bsz, hp, 128), jnp.int32),
        ],
        interpret=interpret_mode(),
    )(bounds, key_p)
    return out, cnt[:, :, 0]


@functools.lru_cache(maxsize=None)
def make_select_compact(orig_w: int, spacing: int):
    """Build the (vmappable) select+compact entry for one geometry.
    `orig_w` is the FULL-RESOLUTION image width the packed flat indices
    were computed with; `spacing` is 2 when the key map was 2x2
    min-pooled (nms_spaced) and 1 otherwise — the kernel needs both to
    rank cutoff-1 ties by flat index (lax.top_k's tie order)."""

    @custom_batching.custom_vmap
    def select_compact(key_p: jax.Array, bounds: jax.Array):
        """Select keys by (strict_bound, eq_bound, tie_budget) = `bounds`
        and left-compact each row. key_p: (HH, WW) i32 packed keys
        (WW % 128 == 0), bounds: (3,) i32. Returns (compacted (HHp, WW),
        counts (HHp,))."""
        from ..features.fast import _PAD_KEY
        out, cnt = _select_compact_batched(key_p[None], bounds[None],
                                           _PAD_KEY, orig_w, spacing)
        return out[0], cnt[0]

    @select_compact.def_vmap
    def _select_vmap(axis_size, in_batched, key_p, bounds):
        from ..features.fast import _PAD_KEY
        out, cnt = _select_compact_batched(key_p, bounds, _PAD_KEY,
                                           orig_w, spacing)
        return (out, cnt), (True, True)

    return select_compact
