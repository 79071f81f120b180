"""Sort-free stream compaction for sparse survivors of dense ops.

Extracting "the few nonzero pixels" (edge coordinates, NMS peaks, run
starts, region seeds) is a recurring postlude after dense TPU compute.
`lax.top_k` over the full map is a FULL SORT (~ms at megapixel shapes) and
scatter is serialized, so compaction here is a log2(W)-stage in-register
butterfly:

  each valid element must move LEFT by (col - rank) lanes; those shift
  amounts are monotone non-decreasing along a row, so routing one shift
  bit per stage is collision-free — log2(W) roll+select passes, no
  one-hot blow-up, no scatter, no sort.

Same construction as features/fast.py `_compact_rows` (the FAST corner
selection), generalized to arbitrary payload tuples + a global placement
step.  Replaces the reference's serial pointer-chasing extraction loops
(e.g. edge-list build in compv_core_feature_houghsht.cxx:58-120) with a
data-parallel formulation; no reference code is used.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_rows(valid: jax.Array, payloads: tuple):
    """Left-compact each row's valid elements.

    valid: (H, W) bool; payloads: tuple of (H, W) arrays (any dtypes).
    Returns (payloads_compacted, counts (H,) int32).  Slots at column
    >= counts[row] hold unspecified values — mask with counts.
    Row-relative order is preserved."""
    hh, ww = valid.shape
    cols = jnp.arange(ww, dtype=jnp.int32)[None, :]
    v = valid
    vi = v.astype(jnp.int32)
    counts = jnp.sum(vi, axis=1)
    rank = jnp.cumsum(vi, axis=1) - vi
    r = jnp.where(v, cols - rank, 0)
    ps = tuple(payloads)
    b = 1
    while b < ww:
        cv = jnp.roll(v, -b, axis=1)
        cr = jnp.roll(r, -b, axis=1)
        move_in = cv & ((cr & b) != 0) & (cols + b < ww)
        moved_out = v & ((r & b) != 0)
        ps = tuple(jnp.where(move_in, jnp.roll(p, -b, axis=1), p)
                   for p in ps)
        r = jnp.where(move_in, cr - b, jnp.where(moved_out, 0, r))
        v = move_in | (v & ~moved_out)
        b <<= 1
    return ps, counts


def compact(valid: jax.Array, payloads: tuple, cap: int):
    """Global top-`cap` compaction of a (H, W) mask, row-major order.

    Returns (payloads (cap,), out_valid (cap,), total int32).  The first
    min(total, cap) slots hold the valid elements in row-major scan order;
    elements beyond `cap` are dropped (check `total`).

    Placement: each output slot g needs the row whose half-open offset
    interval contains g.  A broadcast compare against all H row offsets
    costs a (cap, H) matrix — ~11 ms at cap 262k (the ccl_extract loss in
    BENCH_DETAIL round 3).  Instead scatter each nonempty row's index at
    its start offset and take a running max: row offsets are strictly
    increasing over nonempty rows, so cummax reconstructs the interval
    map in O(cap)."""
    ps, counts = compact_rows(valid, payloads)
    hh = counts.shape[0]
    row_off = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)
    nonempty = counts > 0
    rows = jnp.arange(hh, dtype=jnp.int32)
    scat_idx = jnp.where(nonempty, row_off, cap)      # empties -> dropped
    z = jnp.zeros((cap,), jnp.int32).at[scat_idx].max(
        jnp.where(nonempty, rows, 0), mode="drop")
    row_g = jax.lax.cummax(z)
    o = jnp.zeros((cap,), jnp.int32).at[scat_idx].max(
        jnp.where(nonempty, row_off, 0), mode="drop")
    off_g = jax.lax.cummax(o)
    slot_g = jnp.clip(jnp.arange(cap, dtype=jnp.int32) - off_g, 0,
                      valid.shape[1] - 1)
    out_valid = jnp.arange(cap, dtype=jnp.int32) < total
    out = tuple(p[row_g, slot_g] for p in ps)
    return out, out_valid, total
