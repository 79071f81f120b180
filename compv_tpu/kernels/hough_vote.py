"""SHT vote accumulation — Pallas TPU kernel.

Re-design of the reference's accumulator build
(core/features/hough/compv_core_feature_houghsht.cxx:348-480: per edge
pixel, per theta, `acc[rho][theta]++` — a serial scatter walk). The XLA
formulation (ops/binsum.bincount_batched) already rides the MXU, but its
factored one-hot indicators materialize through HBM: (T, N, BHI+BLO) int8
~= 633 MB at T=180, N=16384, n_rho=2939 — measured as the bulk of the
6.5 ms hough_sht row (BENCH_DETAIL round 4).

Here each grid step holds a (theta-tile, point-chunk) pair in VMEM and,
per theta, builds BOTH one-hot factors in registers and feeds them
straight to the MXU:

    acc_t (BHI, BLO) = hi_onehot (BHI, NC) @ lo_onehot (NC, BLO)

with bin = hi * 128 + lo. The two operand layouts are served by the two
input layouts of the SAME index array (hiT is (T, N): theta-major rows
give hi values on lanes; lo is (N, T): point-major rows give lo values
on sublanes) — no in-kernel transposes, only lane/sublane broadcasts.
Counts accumulate in f32 (exact: N <= 2^24) across point chunks by
revisiting the output block.

Bounds: n_rho <= 32 * 128 = 4096 (hough_sht falls back to the XLA
binsum path beyond — ~4.5K-diagonal images).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

_BHI = 32          # sublane-padded hi-factor bins (23 used at HD)
_BLO = 128
_TT = 128          # thetas per grid step — 128 is also the lane-tiling
#                    minimum for the lo operand's (NC, _TT) blocks, so
#                    the 180->256 theta padding (42% waste on that axis)
#                    cannot be trimmed by shrinking this tile (tried 64,
#                    Mosaic rejects the 64-lane block; 2026-08-20)
_NC = 4096         # points per grid step
_INVALID_HI = 64   # no match against sublane iota [0, _BHI)


def _kernel(hiT_ref, lo_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    hiT = hiT_ref[...]          # (_TT, _NC) i32: hi values, theta-major
    lo = lo_ref[...]            # (_NC, _TT) i32: lo values, point-major
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_BHI, _NC), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_NC, _BLO), 1)
    for tt in range(_TT):
        # f32 one-hot operands: Mosaic rejects the bf16 (32, k) lhs here
        # ("Bad lhs type", verified on-chip 2026-08-20); f32 compiles and
        # the 0/1 products are exact either way
        hi_m = (jnp.broadcast_to(hiT[tt:tt + 1, :], (_BHI, _NC))
                == sub_iota).astype(jnp.float32)
        lo_m = (jnp.broadcast_to(lo[:, tt:tt + 1], (_NC, _BLO))
                == lane_iota).astype(jnp.float32)
        acc = jnp.dot(hi_m, lo_m, preferred_element_type=jnp.float32)
        out_ref[tt] += acc


@functools.partial(jax.jit, static_argnames=("n_rho", "rho_step"))
def sht_vote_pallas(xy: jax.Array, valid: jax.Array, cos_t: jax.Array,
                    sin_t: jax.Array, n_rho: int,
                    rho_step: float) -> jax.Array:
    """(n_rho, T) int-valued f32 accumulator of SHT votes.

    xy: (N, 2) f32 edge coordinates, valid: (N,) bool, cos_t/sin_t: (T,).
    Exactly bincount semantics: each valid point adds 1 to
    acc[round(x cos + y sin / rho_step) + n_rho//2, t] per theta (indices
    clipped to [0, n_rho) like the XLA path)."""
    n, t = xy.shape[0], cos_t.shape[0]
    assert n_rho <= _BHI * _BLO, "n_rho exceeds the kernel's bin space"
    tp = -(-t // _TT) * _TT
    np_ = -(-n // _NC) * _NC
    # rho index per (point, theta); fused XLA pre-pass (one (N, T) i32)
    rho = (xy[:, 0:1] * jnp.pad(cos_t, (0, tp - t))[None, :]
           + xy[:, 1:2] * jnp.pad(sin_t, (0, tp - t))[None, :])
    idx = jnp.clip(jnp.round(rho / rho_step).astype(jnp.int32)
                   + (n_rho // 2), 0, n_rho - 1)
    hi = jnp.where(valid[:, None], idx // _BLO, _INVALID_HI)
    lo = jnp.where(valid[:, None], idx - (idx // _BLO) * _BLO, 0)
    hiT = jnp.pad(hi.T, ((0, 0), (0, np_ - n)),
                  constant_values=_INVALID_HI)            # (Tp, Np)
    lo_p = jnp.pad(lo, ((0, np_ - n), (0, 0)))            # (Np, Tp)

    out = pl.pallas_call(
        _kernel,
        grid=(tp // _TT, np_ // _NC),
        in_specs=[
            pl.BlockSpec((_TT, _NC), lambda ti, ci: (ti, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NC, _TT), lambda ti, ci: (ci, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TT, _BHI, _BLO), lambda ti, ci: (ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, _BHI, _BLO), jnp.float32),
        interpret=interpret_mode(),
    )(hiT, lo_p)
    # bins = hi * 128 + lo; trim padded thetas and the bin overhang
    return out.reshape(tp, _BHI * _BLO)[:t, :n_rho].T
