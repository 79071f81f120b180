"""Single-chunk multi-payload nonzero compaction — Pallas TPU kernel.

Compacts the masked elements of up to ~130k-element 1-D arrays into a
dense prefix, carrying several payload arrays through ONE in-VMEM
butterfly — no sort, no gather, no scatter. XLA gathers cost ~6 ns per
element on TPU, so "collect the K selected rows of 7 stat arrays" at
K ~ 25k (CCL boxes-only extraction) was ~1.7 ms of pure gather; this
kernel does the same collection in ~0.1 ms.

Single chunk by design: the whole array is one VMEM block, so the output
is a true dense prefix (no inter-chunk block-rounding holes and nothing
to re-sort). Capacity bound: N <= 2^17 elements and <= ~6 payloads keeps
peak VMEM ~8 MB.

Reference analogue: the serial table-walk extractions of
core/ccl/compv_core_ccl_lsl_result.cxx — redesigned as a data-parallel
rank-and-route butterfly (same construction as features/fast.py
_compact_rows, extended to flat order + multiple payloads).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_LANES = 128
MAX_N = 1 << 17


def _kernel(mask_ref, *refs, n_pay, rows):
    in_refs = refs[:n_pay]
    out_refs = refs[n_pay:2 * n_pay + 1]   # payload outs + total out
    m = mask_ref[0]                        # (rows, 128) i32 0/1
    shape = m.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rws = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    # global rank: in-lane prefix + cross-row exclusive prefix (tril MXU)
    inc = m
    d = 1
    while d < _LANES:
        inc = inc + jnp.where(cols >= d, jnp.roll(inc, d, axis=1), 0)
        d <<= 1
    # cross-row exclusive prefix of row totals: log-step Hillis-Steele
    # along sublanes (a (rows, rows) tril-matmul would need 12 MB of
    # iota/one-hot at 1024 rows — far over the VMEM budget)
    row_tot = jnp.broadcast_to(
        jnp.sum(m, axis=1, keepdims=True), shape).astype(jnp.int32)
    inc_r = row_tot
    d = 1
    while d < rows:
        inc_r = inc_r + jnp.where(rws >= d, jnp.roll(inc_r, d, axis=0), 0)
        d <<= 1
    ex_row = inc_r - row_tot
    rank = ex_row + inc - m
    total = inc_r[rows - 1, 0]

    def flatroll(v, b):
        q, mm = divmod(b, _LANES)
        if mm == 0:
            return jnp.roll(v, -q, axis=0) if q else v
        a = jnp.roll(v, -mm, axis=1)
        lo = jnp.roll(a, -q, axis=0) if q else a
        hi = jnp.roll(a, -(q + 1), axis=0)
        return jnp.where(cols < _LANES - mm, lo, hi)

    # LSB-first butterfly on (valid, rank-shift) routing; payloads ride
    # the same routing decisions. Vacated slots become invalid (payload
    # outputs there are zero-filled at the end).
    lpos = rws * _LANES + cols
    rsh = jnp.where(m > 0, lpos - rank, 0)
    val = m
    pays = [r[0] for r in in_refs]
    b = 1
    while b < rows * _LANES:
        cv = flatroll(val, b)
        cr = flatroll(rsh, b)
        move_in = (cv > 0) & ((cr & b) != 0) & (lpos + b < rows * _LANES)
        moved_out = (val > 0) & ((rsh & b) != 0)
        pays = [jnp.where(move_in, flatroll(p, b), p) for p in pays]
        val = jnp.where(move_in, 1, jnp.where(moved_out, 0, val))
        rsh = jnp.where(move_in, cr - b, jnp.where(moved_out, 0, rsh))
        b <<= 1
    for k in range(n_pay):
        out_refs[k][0] = jnp.where(val > 0, pays[k],
                                   jnp.zeros_like(pays[k]))
    out_refs[n_pay][0] = jnp.zeros_like(out_refs[n_pay][0]) + total


@functools.partial(jax.jit, static_argnames=("cap",))
def nonzero_compact(mask: jax.Array, payloads: tuple, cap: int):
    """Dense-prefix compaction of `payloads` where `mask` is nonzero.

    mask: (N,) any int/bool; payloads: tuple of (N,) i32/f32 arrays;
    N <= 2^17. Returns (payloads_out tuple of (cap,), total () i32):
    slot j < min(total, cap) holds the j-th masked element's payloads in
    index order; slots >= total are zero. Elements beyond `cap` are
    dropped (check total — the docs/API.md overflow convention)."""
    n = mask.shape[0]
    assert n <= MAX_N, n
    npad = -(-n // (8 * _LANES)) * (8 * _LANES)
    m = jnp.pad(mask.astype(jnp.int32), (0, npad - n))
    ps = tuple(jnp.pad(p, (0, npad - n)) for p in payloads)
    rows = npad // _LANES
    kern = functools.partial(_kernel, n_pay=len(ps), rows=rows)
    blk = pl.BlockSpec((1, rows, _LANES), lambda i: (0, 0, 0))
    outs = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[blk] * (1 + len(ps)),
        out_specs=[blk] * len(ps) + [
            pl.BlockSpec((1, 8, _LANES), lambda i: (0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, rows, _LANES), p.dtype)
                   for p in ps] + [
                   jax.ShapeDtypeStruct((1, 8, _LANES), jnp.int32)],
        interpret=interpret_mode(),
    )(m.reshape(1, rows, _LANES),
      *[p.reshape(1, rows, _LANES) for p in ps])
    total = outs[-1][0, 0, 0]
    return tuple(o.reshape(-1)[:cap] for o in outs[:-1]), total
