"""FAST-9/12 corner detector, TPU-native formulation.

Re-design of core/features/fast/compv_core_feature_fast_dete.cxx (:103-868,
plus ~3.4k LoC of SSE2/AVX2/NEON asm). The reference's per-pixel branchy
segment test becomes a dense, branch-free tensor program:

  1. Gather the 16 Bresenham-circle neighbors as 16 shifted image planes
     (offsets as in fast_dete.cxx:221-238).
  2. db = relu(circle - (p + t)), dd = relu((p - t) - circle)  [saturated u8]
  3. strength(p) = max over the 16 cyclic arc starts s of
         min_{k < N} diff[(s + k) mod 16]
     computed with a log2(N) cyclic min-reduction over the 16-plane stack.
     This is *exactly* the reference's strength (fast_dete.cxx:708-716:
     max over valid arcs of min over arc), because an arc with any
     non-positive diff contributes min 0 — validity is implicit.
  4. NMS: suppress pixels whose 8-neighborhood contains a strength >= own
     (fast_dete.cxx:773-815), restricted to the interior [3, dim-3).
  5. Corner list: lax.top_k over the flattened strengths map replaces the
     reference's nth_element selectBest.

Whole-frame cost: ~16·(2 + log2 N) VPU ops over the image — one HBM pass
after XLA fusion; no data-dependent control flow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import FastConfig, FastType
from ..core.registry import register
from ..core.types import Points

# Bresenham circle radius 3, clockwise from 12 o'clock; (dx, dy) pairs in the
# reference's pixels16 order (fast_dete.cxx:221-238, stride*dy + dx).
CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def _circle_stack(img: jax.Array) -> jax.Array:
    """(16, H, W) stack of circle-neighbor values (zero-padded borders; the
    3-px frame is masked out of the result anyway)."""
    h, w = img.shape
    pad = jnp.pad(img, 3)
    planes = [jax.lax.dynamic_slice(pad, (3 + dy, 3 + dx), (h, w))
              for dx, dy in CIRCLE]
    return jnp.stack(planes)


def _cyclic_min_windows(diff: jax.Array, n: int) -> jax.Array:
    """M[s] = min(diff[s], ..., diff[(s+n-1) % 16]) along axis 0 (size 16),
    via a log-step rolling min: O(log n) VPU passes instead of 16*n."""
    m = diff
    span = 1
    while span * 2 <= n:
        m = jnp.minimum(m, jnp.roll(m, -span, axis=0))
        span *= 2
    if span < n:
        # cover the remaining n - span elements with one overlapping step
        m = jnp.minimum(m, jnp.roll(m, -(n - span), axis=0))
    return m


def fast_strengths(img: jax.Array, threshold: int = 20,
                   n: int = 9) -> jax.Array:
    """(H, W) uint8 strengths map, bit-exact vs the reference scalar kernel
    CompVFastDataRow_C (fast_dete.cxx:658-770)."""
    assert n in (9, 12)
    p = img.astype(jnp.int16)
    brighter = jnp.minimum(p + threshold, 255)
    darker = jnp.maximum(p - threshold, 0)
    circle = _circle_stack(img).astype(jnp.int16)
    db = jnp.maximum(circle - brighter[None], 0).astype(jnp.uint8)
    dd = jnp.maximum(darker[None] - circle, 0).astype(jnp.uint8)
    sb = jnp.max(_cyclic_min_windows(db, n), axis=0)
    sd = jnp.max(_cyclic_min_windows(dd, n), axis=0)
    strengths = jnp.maximum(sb, sd)
    # 3-px frame carries no valid segment test (reference computes rows
    # [3, h-3) only).
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, strengths, 0)


def fast_nms(strengths: jax.Array) -> jax.Array:
    """Suppress non-maxima: zero any pixel whose 8-neighborhood has a
    strength >= its own (ties suppress, fast_dete.cxx:773-815). Applied to
    the interior [3, dim-3) like the reference."""
    h, w = strengths.shape
    s = strengths.astype(jnp.int16)
    pad = jnp.pad(s, 1)
    neigh = [jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    nmax = functools.reduce(jnp.maximum, neigh)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    keep = (s > 0) & (nmax < s)
    return jnp.where(interior, jnp.where(keep, strengths, 0), strengths)


_SEG = 128      # lane-width column segments for the compaction one-hot


def _pack_key(s_i32: jax.Array, idx_i32: jax.Array) -> jax.Array:
    """(255-strength, flat index) packed into one i32: ascending sort order
    == (strength desc, index asc), lax.top_k's exact tie semantics."""
    return ((255 - s_i32) << 22) | idx_i32


_PAD_KEY = (255 << 22) | ((1 << 22) - 1)   # pack(strength=0, idx=max)


def _compact_rows(key_c: jax.Array, pad_key: int):
    """Left-compact the valid (< pad) keys of each row in-register via an
    LSB-first butterfly: a compaction's shift amounts (col - rank) are
    monotone non-decreasing along the row, so routing one shift bit per
    stage is collision-free. log2(W) roll+select passes — no one-hot
    blow-up, no scatter, no sort. Within-row order is preserved (and
    irrelevant anyway: the caller re-sorts the final k keys). Validity is
    IMPLICIT — a slot is live iff its key != pad_key (real keys always
    differ from the pad), which drops the third carried array and ~30%
    of the per-stage work."""
    hh, ww = key_c.shape
    vi = (key_c != pad_key).astype(jnp.int32)
    rank = jnp.cumsum(vi, axis=1) - vi
    cols = jnp.arange(ww, dtype=jnp.int32)[None, :]
    r = jnp.where(vi > 0, cols - rank, 0)
    y = key_c
    b = 1
    while b < ww:
        cand = jnp.roll(y, -b, axis=1)
        cr = jnp.roll(r, -b, axis=1)
        move_in = (cand != pad_key) & ((cr & b) != 0) & (cols + b < ww)
        moved_out = (y != pad_key) & ((r & b) != 0)
        y = jnp.where(move_in, cand, jnp.where(moved_out, pad_key, y))
        r = jnp.where(move_in, cr - b, jnp.where(moved_out, 0, r))
        b <<= 1
    return y, jnp.sum(vi, axis=1)


def _cutoff_select(strengths: jax.Array, k: int,
                   nms_spaced: bool = False):
    """Sort-free exact top-k of a u8 strengths map.

    The full-map sort dominated FAST (~1.2 ms/frame of 1.37 at HD; a
    BATCHED big lax.sort additionally takes minutes to compile). But a
    u8 map admits exact selection without sorting:
      1. binary-search the strength cutoff c (8 masked reductions READ
         FROM THE u8 MAP — round 2 materialized a padded i32 copy first,
         ~4x the compulsory traffic for the hottest postlude stage): the
         smallest c with #{s >= c} <= k;
      2. ties at c-1 resolve by ascending flat index. Round 2 ranked
         every tie with a full-map row cumsum + row-offset broadcast;
         now only PER-ROW tie counts (one cheap reduction) pick the rows
         whose ties can still be needed (exclusive row cumsum < r), all
         their ties are over-selected (at most one extra row's worth,
         <= W), and the final small sort cuts exactly — same result,
         two full-map passes fewer;
      3. (nms_spaced) NMS with suppress-on-tie leaves at most one survivor
         per 2x2 block, so the selected-key map min-pools 2x2 losslessly —
         strided-slice minimum is free, reshape-reduce relayouts (~2.5 ms);
      4. left-compact each row's selected keys with a log2(W)-stage
         butterfly (_compact_rows) — the prior one-hot compare-reduce
         materialized a (rows, segs, 128, 128) i32 intermediate (~140 MB
         of HBM traffic at HD);
      5. place rows via searchsorted over row offsets + a (k+W)-element
         gather (small gathers are ~6 ns/element — fine at this size);
      6. restore the exact contract with one (k+W)-element packed sort.
    Returns sorted packed keys (k,). Bit-identical to lax.top_k over the
    flat map regardless of nms_spaced."""
    h, w = strengths.shape
    span = 2 * _SEG if nms_spaced else _SEG
    wp = -(-w // span) * span
    hp = h + (h % 2) if nms_spaced else h
    su = jnp.pad(strengths, ((0, hp - h), (0, wp - w)))    # stays u8

    # ONE full-resolution pass: pack (255-s, flat_idx) keys where s > 0.
    # Everything after runs on the 2x2-min-pooled key map when NMS
    # guarantees <= 1 survivor per block — 4x less data for the cutoff
    # search, tie counting, selection AND compaction (round 2 ran the
    # cutoff + tie passes at full res; the fused kernel is 63 us but this
    # postlude was ~170 us of the 233 us total, profiled 2026-08-19).
    si = su.astype(jnp.int32)
    cols = jnp.arange(wp, dtype=jnp.int32)[None, :]
    flat_idx = jnp.arange(hp, dtype=jnp.int32)[:, None] * w + cols
    key_full = jnp.where(su > 0, _pack_key(si, flat_idx), _PAD_KEY)
    if nms_spaced:
        a = jnp.minimum(key_full[0::2], key_full[1::2])
        key_p = jnp.minimum(a[:, 0::2], a[:, 1::2])
    else:
        key_p = key_full

    # exact cutoff from ONE histogram pass (pooling dropped only zeros,
    # so counts match the full map for every c >= 1): round 3's unrolled
    # 8-step binary search was 8 SEQUENTIAL full-map reduce launches
    # (data-dependent midpoints serialize them); a 256-bin MXU histogram
    # (ops/binsum) + a 256-entry suffix cumsum gives every count at once.
    from ..ops import binsum
    sp = 255 - (key_p >> 22)                   # pooled strengths; PAD -> 0
    hist = binsum.bincount(sp, 256)
    cum = jnp.cumsum(hist[::-1])[::-1]         # cum[c] = #{s >= c}
    # smallest c >= 1 with cum[c] <= k (cum[256] = 0 would always qualify)
    c = 1 + jnp.sum((cum[1:] > k).astype(jnp.int32))
    bins = jnp.arange(256, dtype=jnp.int32)
    strict_n = jnp.sum(jnp.where(bins >= c, hist, 0))
    r = k - strict_n
    strict_bound = (256 - c) << 22
    eq_bound = (257 - c) << 22
    strict = key_p < strict_bound
    eq = (key_p >= strict_bound) & (key_p < eq_bound) & (c > 1)
    # over-select ties by pooled-row blocks: a tie with flat-rank q < r
    # lies in a pooled row whose exclusive cumulative tie count is <= q
    # < r (pooled rows preserve flat-index order ACROSS rows), so keeping
    # whole rows while cum_ex < r covers the needed set; at most one
    # row's worth (<= w) of extra ties rides along and the final small
    # sort cuts exactly.
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled():
        # selection mask, exact tie budgeting, flat compaction AND global
        # placement in ONE VMEM pass (kernels/select_place.py) — the
        # round-4 two-stage form (select kernel + XLA scatter/cummax/
        # gather placement) cost 22 + 33 us/frame at HD batch 8; the
        # final small sort restores the exact (strength, index) order
        from ..kernels.select_place import make_select_place
        bounds = jnp.stack([strict_bound,
                            jnp.where(c > 1, eq_bound, strict_bound),
                            r]).astype(jnp.int32)
        hh2, ww2 = key_p.shape
        sp = make_select_place(_PAD_KEY, k, 2 if nms_spaced else 1, w,
                               ww2 // 128, (1 << 22) - 1)
        buf = sp(key_p.reshape(hh2 * ww2 // 128, 128), bounds)
        return jax.lax.sort(buf)[:k]
    else:
        row_tot = jnp.sum(eq.astype(jnp.int32), axis=1)
        cum_ex = jnp.cumsum(row_tot) - row_tot
        sel = strict | (eq & (cum_ex < r)[:, None])
        key_c = jnp.where(sel, key_p, _PAD_KEY)

        # butterfly compaction on 128-lane segments: reshape each row
        # into its lane segments as extra rows — 7 roll+select stages
        # instead of log2(W); row-major order is preserved (segments of
        # a row stay in order), so placement semantics are unchanged.
        hh, ww = key_c.shape
        key_c = key_c.reshape(hh * (ww // _SEG), _SEG)
        cap = k + w                       # k strict + <= one row of ties
        ck, counts = _compact_rows(key_c, _PAD_KEY)
    nrows = counts.shape[0]
    row_off = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)
    # placement via ONE scatter + running max of a PACKED (row, offset)
    # value (row offsets strictly increase over nonempty rows, so the
    # packed values are monotone and cummax fills both fields at once —
    # the two-scatter/two-cummax form was ~half of the 38 us/frame
    # placement cost, profiled 2026-08-20)
    assert cap < (1 << 16) and nrows < (1 << 15), (cap, nrows)
    nonempty = counts > 0
    rows_i = jnp.arange(nrows, dtype=jnp.int32)
    scat = jnp.where(nonempty, row_off, cap)
    z = jnp.zeros((cap,), jnp.int32).at[scat].max(
        jnp.where(nonempty, rows_i * 65536 + row_off, 0), mode="drop")
    pg = jax.lax.cummax(z)
    row_g = pg >> 16
    off_g = pg & 0xFFFF
    g = jnp.arange(cap, dtype=jnp.int32)
    slot_g = jnp.clip(g - off_g, 0, ck.shape[1] - 1)
    # flat 1-D gather: the 2-D (row_g, slot_g) form lowered ~2x slower
    # on-chip (48 vs 27 us/frame for the same elements, 2026-08-19)
    keys = ck.reshape(-1)[row_g * ck.shape[1] + slot_g]
    keys = jnp.where(g < total, keys, _PAD_KEY)
    return jax.lax.sort(keys)[:k]


def cutoff_topk_flat(key_u8: jax.Array, k: int):
    """Exact top-k (value desc, index asc — lax.top_k tie semantics) of a
    1-D integer-valued key array clamped to [0, 255], WITHOUT the full
    sort lax.top_k lowers to (CLAUDE.md XLA-TPU trap #4: ~0.3-0.5 ms at
    the 131k-262k sizes of the CCL/KHT component tables).

    Returns (picked (k,) bool, idx (k,) i32); key values at idx must be
    re-read by the caller (the selection key is the CLAMPED value).
    Requires key_u8.shape[0] < 2^22 (the packed-key index space)."""
    n = key_u8.shape[0]
    assert n < (1 << 22), "flat index exceeds the 22-bit packed-key space"
    np_ = -(-n // _SEG) * _SEG
    m = jnp.pad(key_u8.astype(jnp.uint8), (0, np_ - n))
    keys = _cutoff_select(m.reshape(-1, _SEG), min(k, n))
    if min(k, n) < k:
        keys = jnp.pad(keys, (0, k - n), constant_values=_PAD_KEY)
    picked = keys != _PAD_KEY
    idx = jnp.where(picked, keys & ((1 << 22) - 1), 0).astype(jnp.int32)
    return picked, idx


def _keys_to_points(keys: jax.Array, max_features: int, k: int, w: int,
                    level: int, size: float) -> Points:
    idx = keys & ((1 << 22) - 1)
    vals = (255 - (keys >> 22)).astype(jnp.float32)
    return _vals_idx_to_points(vals, idx, max_features, k, w, level, size)


def _vals_idx_to_points(vals: jax.Array, idx: jax.Array, max_features: int,
                        k: int, w: int, level: int, size: float) -> Points:
    if k < max_features:
        vals = jnp.pad(vals, (0, max_features - k))
        idx = jnp.pad(idx, (0, max_features - k))
    valid = vals > 0
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    return Points(
        xy=jnp.stack([xs, ys], axis=1),
        strength=jnp.where(valid, vals, -jnp.inf),
        angle=jnp.zeros((max_features,), jnp.float32),
        level=jnp.full((max_features,), level, jnp.int32),
        size=jnp.full((max_features,), size, jnp.float32),
        count=jnp.sum(valid).astype(jnp.int32),
    )


def strengths_to_points(strengths: jax.Array, max_features: int,
                        level: int = 0, size: float = 7.0,
                        nms_spaced: bool = False) -> Points:
    """Extract the top-k strongest pixels into a padded Points set.

    Replaces the reference's build-interest-points + selectBest
    (fast_dete.cxx:418, CompVInterestPoint::selectBest) with a sort-free
    cutoff selection (see _cutoff_select) — deterministic, no host sync,
    bit-identical to lax.top_k over the flat map (descending strength,
    ties by ascending index).
    """
    h, w = strengths.shape
    k = min(max_features, h * w)  # small images: can't select more than H*W
    if h * w >= (1 << 22):
        # flat index no longer fits the 22-bit pack; top_k's pair sort
        vals, idx = jax.lax.top_k(
            strengths.reshape(-1).astype(jnp.float32), k)
        vals = jnp.where(idx < h * w, vals, 0.0)
        return _vals_idx_to_points(vals, idx, max_features, k, w, level,
                                   size)
    keys = _cutoff_select(strengths, k, nms_spaced)
    return _keys_to_points(keys, max_features, k, w, level, size)


def strengths_to_points_batch(strengths: jax.Array, max_features: int,
                              level: int = 0, size: float = 7.0,
                              nms_spaced: bool = False) -> Points:
    """Batched (B, H, W) variant of strengths_to_points."""
    return jax.vmap(
        lambda m: strengths_to_points(m, max_features, level, size,
                                      nms_spaced)
    )(strengths)


@functools.partial(jax.jit, static_argnames=("config",))
def fast_detect_batch(imgs: jax.Array,
                      config: FastConfig = FastConfig()) -> Points:
    """Batched FAST over (B, H, W) frames — the serving-throughput path:
    strengths+NMS run as one Pallas grid over (batch, row-tiles); the
    postlude is vmapped. Returns Points with leading batch dim."""
    n = 9 if config.fast_type == FastType.FAST9 else 12
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled():
        from ..kernels.fast_kernel import fast_strengths_pallas
        s = fast_strengths_pallas(imgs, config.threshold, n,
                                  nms=config.nonmax_suppression)
    else:
        def one(im):
            st = fast_strengths(im, config.threshold, n)
            return fast_nms(st) if config.nonmax_suppression else st
        s = jax.vmap(one)(imgs)
    return strengths_to_points_batch(
        s, config.max_features, nms_spaced=config.nonmax_suppression)


@register("corner_detector", "fast")
def make_fast(config: FastConfig = FastConfig()):
    """Factory (reference COMPV_FAST_ID): returns a jit-able detect fn."""

    def detect(img: jax.Array) -> Points:
        return fast_detect(img, config)

    return detect


@functools.partial(jax.jit, static_argnames=("config",))
def fast_detect(img: jax.Array, config: FastConfig = FastConfig()) -> Points:
    """Full FAST pipeline: strengths -> optional NMS -> top-k points.
    On TPU the strengths+NMS stage runs as one fused Pallas kernel
    (kernels/fast_kernel.py); elsewhere as the fused-XLA formulation above
    (bit-identical — tests assert maxdiff 0)."""
    n = 9 if config.fast_type == FastType.FAST9 else 12
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled():
        from ..kernels.fast_kernel import fast_strengths_vmappable
        s = fast_strengths_vmappable(config.threshold, n,
                                     config.nonmax_suppression)(img)
    else:
        s = fast_strengths(img, config.threshold, n)
        if config.nonmax_suppression:
            s = fast_nms(s)
    return strengths_to_points(s, config.max_features,
                               nms_spaced=config.nonmax_suppression)
