"""Scatter-free bincount via factored one-hot matmuls (MXU histograms).

TPU has no fast scatter: `jax.ops.segment_sum` into B bins serializes on
the scatter unit at ~7 ns/element (a 3M-vote Hough accumulation costs
~22 ms), and a full `one_hot(N, B)` reduction materializes N*B elements.

The trick: factor the bin index as  idx = hi * BLO + lo.  Then

    count[hi, lo] = sum_p  w_p * [hi_p == hi] * [lo_p == lo]

is ONE (BHI, N) x (N, BLO) matmul over two thin indicator matrices built
with vector compares — `BHI + BLO` compares per element instead of `B`,
and the accumulation rides the MXU (int8 x int8 -> int32: exact) instead
of the scatter unit.  For B = 4096 that is 32x fewer compares; for the
Hough transform's 2943 rho bins it turns a 22 ms scatter into sub-ms
matmuls.

Replaces the scatter/one-hot voting paths of the reference's accumulator
builders (e.g. core/features/hough/compv_core_feature_houghsht.cxx:58-668
`acc[rho][theta]++`, base/math/compv_math_histogram.cxx histogram build)
with an MXU-native formulation; no reference code is used.

Exactness: unweighted counts use int8 indicators with int32 accumulation
(bit-exact).  Weighted sums use float32 (products are exact — one factor
is a 0/1 indicator — so only the final accumulation rounds, like any f32
segment_sum).

Out-of-range indices (idx < 0 or idx >= n_bins) contribute NOTHING — the
natural encoding for validity masks (set invalid entries to -1 or n_bins).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _split(n_bins: int) -> tuple[int, int]:
    """(BHI, BLO) with BHI*BLO >= n_bins, minimizing BHI+BLO subject to
    lane-friendly BLO: 128 lanes once the bin space is big enough to
    amortize, else the tightest power of two above sqrt(n_bins)."""
    if n_bins >= 1024:
        blo = 128
    else:
        blo = 1
        while blo * blo < n_bins:
            blo *= 2
    bhi = -(-n_bins // blo)
    return bhi, blo


def _indicators(idx: jax.Array, n_bins: int, weights, dtype):
    """Build (..., BHI) weighted and (..., BLO) unweighted indicators."""
    bhi, blo = _split(n_bins)
    idx = idx.astype(jnp.int32)
    hi = idx // blo
    lo = idx - hi * blo
    hi_eq = hi[..., None] == jnp.arange(bhi, dtype=jnp.int32)
    lo_eq = lo[..., None] == jnp.arange(blo, dtype=jnp.int32)
    if weights is None:
        return hi_eq.astype(dtype), lo_eq.astype(dtype), bhi, blo
    w = weights.astype(jnp.float32)[..., None]
    return (jnp.where(hi_eq, w, 0.0), lo_eq.astype(jnp.float32), bhi, blo)


def bincount(idx: jax.Array, n_bins: int,
             weights: jax.Array | None = None) -> jax.Array:
    """(n_bins,) bin sums of `idx` (any shape, flattened).

    weights=None -> int32 exact counts; else float32 weighted sums
    (weights must match idx's shape)."""
    flat = idx.reshape(-1)
    w = None if weights is None else weights.reshape(-1)
    hi_m, lo_m, bhi, blo = _indicators(flat, n_bins, w, jnp.int8)
    acc = jax.lax.dot_general(
        hi_m, lo_m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32 if w is not None else jnp.int32)
    return acc.reshape(bhi * blo)[:n_bins]


def bincount_batched(idx: jax.Array, n_bins: int,
                     weights: jax.Array | None = None) -> jax.Array:
    """(B, n_bins) bin sums for idx of shape (B, N) — one MXU batch, no
    per-batch dispatch (the Hough voting shape: B thetas x N points)."""
    hi_m, lo_m, bhi, blo = _indicators(idx, n_bins, weights, jnp.int8)
    acc = jax.lax.dot_general(
        hi_m, lo_m, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=(jnp.float32 if weights is not None
                                else jnp.int32))
    return acc.reshape(idx.shape[0], bhi * blo)[:, :n_bins]


def apply_lut256(img: jax.Array, lut: jax.Array) -> jax.Array:
    """Gather-free 256-entry LUT apply for uint8 images, ANY lut (the
    monotone restriction of the compare-chain method is gone).

    out(v) = sum_{hi,lo} lut[16*hi+lo] * [v_hi==hi] * [v_lo==lo]
           = sum_hi [v_hi==hi] * (Lo @ lut2d[hi,:])
    — one (N,16)x(16,16) matmul + a 16-way masked reduce.  Exact: every
    product has a 0/1 factor and exactly one term survives per pixel.
    Replaces per-pixel gathers (~6 ns/element on XLA-TPU) and the
    255-pass monotone compare chain."""
    v = img.astype(jnp.int32)
    hi = v >> 4
    lo = v & 15
    lo_m = (lo[..., None] == jnp.arange(16, dtype=jnp.int32)
            ).astype(jnp.float32)
    lut2d = lut.astype(jnp.float32).reshape(16, 16)
    t = lo_m @ lut2d.T                       # (..., 16): t[..., h] = lut2d[h, lo]
    hi_m = hi[..., None] == jnp.arange(16, dtype=jnp.int32)
    out = jnp.sum(jnp.where(hi_m, t, 0.0), axis=-1)
    return out.astype(lut.dtype)
