"""Connected-component labeling + component feature extraction.

Re-design of the reference's PLSL (Parallel Light Speed Labeling,
core/ccl/compv_core_ccl_lsl.cxx, 1,249 LoC + SSE/AVX/NEON asm) and its
result extraction (boxes/points/blobs, compv_ccl.h:137).

LSL's run-length + equivalence-table algorithm is inherently sequential per
row-pair; the TPU-native equivalent is label propagation with path halving:
  * init: every foreground pixel's label = its linear index
  * iterate: label = min(label, neighbors' labels) followed by one
    pointer-jump (label = label[label]) — the jump gives near-logarithmic
    convergence in component diameter
  * fixpoint detected with a psum-able change flag under lax.while_loop

Extraction: segment_min/max/sum keyed by final labels produce bounding boxes,
areas, and centroids in one pass; components are surfaced as a fixed-capacity
top-K-by-area table (the reference sorts blobs on demand).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.registry import register


class Components(NamedTuple):
    """Fixed-capacity component table."""

    boxes: jax.Array      # (C, 4) int32: x0, y0, x1, y1 inclusive
    areas: jax.Array      # (C,) int32
    centroids: jax.Array  # (C, 2) float32
    roots: jax.Array      # (C,) int32 — root linear index (stable id)
    count: jax.Array      # () int32
    moments: jax.Array    # (C, 6) f32: sum(1), sum(x), sum(y),
    #                       sum(x*x), sum(x*y), sum(y*y)
    #                       (reference CompVConnectedComponentMoments,
    #                       compv_ccl.h:39)
    run_count: jax.Array  # () int32 — TRUE number of row-runs in the
    #                       image; if > the max_runs the extraction ran
    #                       with, late-scan runs were dropped and every
    #                       stat is partial (re-extract with a bigger cap)
    total_components: jax.Array = 0  # () int32 — TRUE number of
    #                       components among the (possibly truncated) run
    #                       table; > count means the top-K selection
    #                       dropped small components (docs/API.md failure
    #                       convention: overflow is visible, never silent)


class BoxTable(NamedTuple):
    """Boxes-only component table (reference
    extract(COMPV_CCL_EXTRACT_TYPE_BOXES) — the LSL result's cheapest
    extraction, core/ccl/compv_core_ccl_lsl_result.cxx: a single walk of
    the LEA run table updating bbox min/max + area). Rows are in
    ascending component-root order (== first-pixel scan order), NOT
    sorted by area — matching the reference, which emits boxes in label
    order without any top-K selection."""

    boxes: jax.Array      # (C, 4) int32: x0, y0, x1, y1 inclusive
    areas: jax.Array      # (C,) int32
    roots: jax.Array      # (C,) int32 — root linear index (stable id)
    count: jax.Array      # () int32 — valid rows
    run_count: jax.Array  # () int32 — TRUE run count (see Components)
    total_components: jax.Array  # () int32 — TRUE component count; >
    #                       count means capacity overflow (never silent)


class Runs(NamedTuple):
    """Fixed-capacity per-row run-length table (the reference's RLE/RLC
    "segments" result, COMPV_PLSL_TYPE_RLE, sorted top->down left->right
    per COMPV_PLSL_SET_BOOL_SORT_SEGMENTS)."""

    y: jax.Array          # (R,) int32 row
    x0: jax.Array         # (R,) int32 run start (inclusive)
    x1: jax.Array         # (R,) int32 run end (inclusive)
    root: jax.Array       # (R,) int32 component root of the run
    count: jax.Array      # () int32 — number of valid runs


class BlobPoints(NamedTuple):
    """Per-component pixel lists at fixed capacity (reference
    extract(COMPV_CCL_EXTRACT_TYPE_BLOB))."""

    xy: jax.Array         # (C, cap, 2) int32 (x, y)
    counts: jax.Array     # (C,) int32 — true pixel count (may exceed cap;
    #                       the list is then truncated, row-major order)


def _neighbor_min(lbl: jax.Array, fg: jax.Array, connectivity: int) -> jax.Array:
    h, w = lbl.shape
    big = jnp.int32(h * w)
    pad = jnp.pad(lbl, 1, constant_values=big)
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    out = lbl
    for dy, dx in offs:
        n = jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))
        out = jnp.minimum(out, n)
    return jnp.where(fg, out, big)


def _segmented_min_scan(v: jax.Array, isbg: jax.Array, axis: int,
                        reverse: bool) -> jax.Array:
    """Running min along `axis` that resets at background pixels: each
    foreground pixel receives the min label of its contiguous run so far.
    Associative (value, boundary) operator -> one log-depth scan."""

    def op(a, b):
        av, ag = a
        bv, bg = b
        return (jnp.where(bg, bv, jnp.minimum(av, bv)), ag | bg)

    out, _ = jax.lax.associative_scan(op, (v, isbg), axis=axis,
                                      reverse=reverse)
    return out


def _sweep(lbl: jax.Array, fg: jax.Array, connectivity: int,
           big) -> jax.Array:
    """One propagation sweep: segmented min-scans along rows and columns
    (labels travel the full run length in log depth — the reason this
    converges in O(component turns), not O(component diameter)) plus one
    diagonal neighbor-min for 8-connectivity."""
    isbg = ~fg
    m = lbl
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 1, False))
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 1, True))
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 0, False))
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 0, True))
    if connectivity == 8:
        m = _neighbor_min(m, fg, 8)
    return jnp.where(fg, m, big)


def _to_tiles(x: jax.Array, th: int, tw: int) -> jax.Array:
    """(H, W) -> (B, th, tw) tile batch (H, W divisible by th, tw)."""
    h, w = x.shape
    return (x.reshape(h // th, th, w // tw, tw)
            .transpose(0, 2, 1, 3).reshape(-1, th, tw))


def _sweep_tiles(lbl: jax.Array, fg: jax.Array, connectivity: int,
                 big) -> jax.Array:
    """One propagation sweep WITHIN each tile of a (B, th, tw) batch:
    segmented min-scans along both tile axes + masked diagonal hops
    (labels never cross tile edges — that's the boundary graph's job)."""
    isbg = ~fg
    m = lbl
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 2, False))
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 2, True))
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 1, False))
    m = jnp.minimum(m, _segmented_min_scan(m, isbg, 1, True))
    if connectivity == 8:
        _, th, tw = lbl.shape
        rows = jnp.arange(th)[None, :, None]
        cols = jnp.arange(tw)[None, None, :]
        # read diagonals from a FROZEN pre-hop copy masked to foreground:
        # updating m in place would let a background pixel pick up a label
        # and relay it to a non-adjacent pixel on the next direction
        base = jnp.where(fg, m, big)
        for dy in (-1, 1):
            for dx in (-1, 1):
                t = jnp.roll(jnp.roll(base, -dy, axis=1), -dx, axis=2)
                ok = (rows < th - 1) if dy == 1 else (rows > 0)
                ok = ok & ((cols < tw - 1) if dx == 1 else (cols > 0))
                m = jnp.minimum(m, jnp.where(ok, t, big))
    return jnp.where(fg, m, big)


@functools.partial(jax.jit,
                   static_argnames=("connectivity", "tile", "max_iters"))
def label_tiled(binary: jax.Array, connectivity: int = 8,
                tile: Tuple[int, int] = (64, 256), max_iters: int = 128,
                init: jax.Array = None) -> jax.Array:
    """Tiled union-merge CCL (differential oracle; see `label` docstring).

    The reference's PLSL (core/ccl/compv_core_ccl_lsl.cxx) is two-phase:
    per-row relative labels, then an equivalence-table resolve. This is the
    same shape at TPU granularity: (1) converge labels INDEPENDENTLY inside
    (th, tw) tiles (batched segmented scans); (2) union-find over the
    cross-tile boundary-slot graph (slots + sort-derived same-label edges,
    a few 10k nodes instead of megapixels); (3) repaint the boundary pixels
    with their canonical roots and re-run the tile sweep, which floods the
    component-wide root without any full-image gather. Convergence cost is
    independent of global component diameter/turn count — but XLA-TPU
    gathers in the union rounds make it slower in wall-clock than the
    Pallas sweep on every measured workload, so `label` does not dispatch
    here.

    Same contract as `label`: foreground pixels share their component
    root's linear index; background = H*W.
    """
    h, w = binary.shape
    th, tw = tile
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    n_pad = hp * wp
    big = jnp.int32(n_pad)
    fgp = jnp.pad(binary > 0, ((0, hp - h), (0, wp - w)))
    idx = jnp.arange(n_pad, dtype=jnp.int32).reshape(hp, wp)
    lbl0 = jnp.where(fgp, idx, big)
    if init is not None:
        # warm start: init holds unpadded-space labels; remap to padded
        r = init.astype(jnp.int32)
        pr = jnp.where(r < h * w, (r // w) * wp + (r % w), big)
        pr = jnp.pad(pr, ((0, hp - h), (0, wp - w)), constant_values=n_pad)
        lbl0 = jnp.where(fgp, jnp.minimum(lbl0, pr), big)

    # ---- phase 1: tile-local fixpoint --------------------------------
    t_fg = _to_tiles(fgp, th, tw)
    t_l = _to_tiles(lbl0, th, tw)

    def body(state):
        lbl, _, it = state
        new = _sweep_tiles(lbl, t_fg, connectivity, big)
        return new, jnp.any(new != lbl), it + 1

    t_l, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), body,
        (t_l, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    L = (t_l.reshape(hp // th, wp // tw, th, tw)
         .transpose(0, 2, 1, 3).reshape(hp, wp))

    # ---- phase 2: union-find over BOUNDARY SLOTS ---------------------
    # All iteration happens in the ~|boundary| slot space, never over the
    # full pixel array: XLA TPU 1D gathers run ~50-100x off roofline, so a
    # pixel-space parent table made every union round cost milliseconds.
    ty, tx = hp // th, wp // tw
    l5 = L.reshape(ty, th, wp)
    ra_ = l5[:-1, th - 1, :]                  # (ty-1, wp) above each h-bnd
    rb_ = l5[1:, 0, :]                        # (ty-1, wp) below
    l6 = L.reshape(hp, tx, tw)
    ca_ = l6[:, :-1, tw - 1]                  # (hp, tx-1) left of each v-bnd
    cb_ = l6[:, 1:, 0]                        # (hp, tx-1) right
    nh = (ty - 1) * wp
    nv = hp * (tx - 1)
    slots = jnp.concatenate([ra_.reshape(-1), rb_.reshape(-1),
                             ca_.reshape(-1), cb_.reshape(-1)])
    S = 2 * nh + 2 * nv                       # + trash slot S
    o_rb, o_ca, o_cb = nh, 2 * nh, 2 * nh + nv

    # adjacency edges between slots: pure index arithmetic, no gathers
    ih = jnp.arange(nh, dtype=jnp.int32)
    iv = jnp.arange(nv, dtype=jnp.int32)
    ea = [ih, o_ca + iv]
    eb = [o_rb + ih, o_cb + iv]
    if connectivity == 8:
        xh = ih % wp
        yv = iv // (tx - 1)
        ea += [ih, ih, o_ca + iv, o_ca + iv]
        eb += [jnp.where(xh < wp - 1, o_rb + ih + 1, S),
               jnp.where(xh > 0, o_rb + ih - 1, S),
               jnp.where(yv < hp - 1, o_cb + iv + (tx - 1), S),
               jnp.where(yv > 0, o_cb + iv - (tx - 1), S)]
    ea = jnp.concatenate(ea)
    eb = jnp.concatenate(eb)
    lab_a = jnp.where(ea < S, slots[jnp.minimum(ea, S - 1)], big)
    lab_b = jnp.where(eb < S, slots[jnp.minimum(eb, S - 1)], big)
    ok = (lab_a < big) & (lab_b < big)
    ea = jnp.where(ok, ea, S)
    eb = jnp.where(ok, eb, S)
    # same-label edges: slots sharing a label are the same tile fragment
    # (labels are globally-unique pixel ids, so equal label => same tile);
    # sort (label, slot) and link sorted neighbors with equal labels
    s_lab, s_idx = jax.lax.sort(
        (slots, jnp.arange(S, dtype=jnp.int32)), num_keys=1)
    same = (s_lab[:-1] == s_lab[1:]) & (s_lab[:-1] < big)
    ea = jnp.concatenate([ea, jnp.where(same, s_idx[:-1], S)])
    eb = jnp.concatenate([eb, jnp.where(same, s_idx[1:], S)])

    parent0 = jnp.arange(S + 1, dtype=jnp.int32)

    def _compress(par):
        """Pointer-doubling to fixpoint — O(|slots|) per step, log depth."""

        def c_body(s):
            p, _, k = s
            q = p[p]
            return q, jnp.any(q != p), k + 1

        par, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < 32), c_body,
            (par, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
        return par

    def u_body(state):
        par, _, it = state
        par = _compress(par)
        qa = par[ea]
        qb = par[eb]
        changed = jnp.any(qa != qb)
        lo = jnp.minimum(qa, qb)
        hi = jnp.maximum(qa, qb)
        par = par.at[hi].min(lo)
        return par, changed, it + 1

    parent, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < 64), u_body,
        (parent0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    parent = _compress(parent)

    # canonical label of each merged set = min label over its slots
    root = parent[:S]
    seg = jnp.where(slots < big, root, S)
    canon_of_root = jax.ops.segment_min(
        jnp.minimum(slots, big), seg, num_segments=S + 1)
    canon = jnp.where(slots < big, canon_of_root[root], big)

    # ---- phase 3: repaint boundaries + one more tile sweep -----------
    # canon <= every fragment root in the set, so painting it onto the
    # boundary pixels and re-running the (cheap) tile-local min sweep
    # floods the component-wide root to every pixel — replacing the
    # full-image parent[label] gather the TPU can't do fast.
    l5 = l5.at[:-1, th - 1, :].set(canon[:nh].reshape(ty - 1, wp))
    l5 = l5.at[1:, 0, :].set(canon[o_rb:o_rb + nh].reshape(ty - 1, wp))
    L = l5.reshape(hp, wp)
    l6 = L.reshape(hp, tx, tw)
    l6 = l6.at[:, :-1, tw - 1].set(canon[o_ca:o_ca + nv].reshape(hp, tx - 1))
    l6 = l6.at[:, 1:, 0].set(canon[o_cb:o_cb + nv].reshape(hp, tx - 1))
    L = l6.reshape(hp, wp)
    t_l = _to_tiles(L, th, tw)

    t_l, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_iters), body,
        (t_l, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    L = (t_l.reshape(hp // th, wp // tw, th, tw)
         .transpose(0, 2, 1, 3).reshape(hp, wp))
    r = L[:h, :w]
    fgc = r < big
    return jnp.where(fgc, (r // wp) * w + (r % wp), h * w).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label_scan(binary: jax.Array, connectivity: int = 8,
               max_iters: int = 512, init: jax.Array = None) -> jax.Array:
    """(H, W) int32 labels: foreground pixels share their component root's
    linear index; background = H*W (sentinel).

    ``init`` warm-starts the propagation (used by the MSER level sweep:
    labels of the previous threshold level are valid initial values because
    its components are subsets of this level's and roots are pixel indices).
    """
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled():
        from ..kernels.ccl_scan import label_pallas
        return label_pallas(binary, connectivity=connectivity, init=init)
    h, w = binary.shape
    fg = binary > 0
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    if init is None:
        lbl0 = jnp.where(fg, idx, big)
    else:
        lbl0 = jnp.where(fg, jnp.minimum(init, idx), big)

    def body(state):
        lbl, _, it = state
        new = _sweep(lbl, fg, connectivity, big)
        changed = jnp.any(new != lbl)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lbl, _, _ = jax.lax.while_loop(
        cond, body, (lbl0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return lbl


def label(binary: jax.Array, connectivity: int = 8,
          max_iters: int = 1024, init: jax.Array = None) -> jax.Array:
    """(H, W) int32 labels: foreground pixels share their component root's
    linear index; background = H*W.

    Production path is the Pallas sweep (`label_scan`): measured on the
    v5e it wins every workload class (text 1.0 ms, merged blobs 2.3 ms,
    1122x1182). `label_tiled` is a structurally different algorithm
    (tile-local converge + boundary union-find) kept as a differential
    oracle — XLA-TPU gathers (~6 ns/element) make its union phase
    10-20 ms at this shape, so it is NOT dispatched; its value is that
    disagreement between the two finds real bugs (it caught the round-1
    max_sweeps=64 silent-split).
    """
    return label_scan(binary, connectivity=connectivity,
                      max_iters=max_iters, init=init)


def _seg_scan_sum(vals, new):
    """Inclusive segmented sum scan: resets where `new` is True."""

    def op(a, b):
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av + bv), af | bf)

    out, _ = jax.lax.associative_scan(op, (vals, new))
    return out


def _seg_scan_minmax(vals, new, take_min):
    def op(a, b):
        av, af = a
        bv, bf = b
        m = jnp.minimum(av, bv) if take_min else jnp.maximum(av, bv)
        return (jnp.where(bf, bv, m), af | bf)

    out, _ = jax.lax.associative_scan(op, (vals, new))
    return out


def _seg_scan_multi(sums, mins, maxs, new):
    """Segmented inclusive scan of many stats in ONE pass: `sums`
    accumulate, `mins`/`maxs` reduce; all share the segment-start flags
    `new`. Returns sums + mins + maxs in argument order.

    On the Pallas path this runs as ONE VMEM-resident kernel
    (kernels/seg_scan.py): associative_scan pushes every one of its
    ~2*log2(N) sweeps through HBM for all carried arrays — measured
    3.56 ms for 10 stats at N=262144 on v5e vs ~20 us compulsory."""
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled():
        from ..kernels.seg_scan import seg_scan_multi
        return seg_scan_multi(sums, mins, maxs, new)
    ns, nm = len(sums), len(mins)

    def op(a, b):
        af, bf = a[-1], b[-1]
        out = []
        for i, (av, bv) in enumerate(zip(a[:-1], b[:-1])):
            if i < ns:
                red = av + bv
            elif i < ns + nm:
                red = jnp.minimum(av, bv)
            else:
                red = jnp.maximum(av, bv)
            out.append(jnp.where(bf, bv, red))
        return tuple(out) + (af | bf,)

    res = jax.lax.associative_scan(
        op, tuple(sums) + tuple(mins) + tuple(maxs) + (new,))
    return res[:-1]


@functools.partial(jax.jit, static_argnames=("max_components", "max_runs"))
def extract_components(labels: jax.Array, max_components: int = 256,
                       max_runs: int = 262144) -> Components:
    """Boxes/areas/centroids/moments of the top-K components by area
    (reference CompVConnectedComponentLabelingResultLSL extract +
    CompVConnectedComponentMoments).

    Run-based, exactly like the reference's LSL result: compact the
    per-row runs with one sort (`_run_table`), compute each run's stats
    in CLOSED FORM from its endpoints (sum of x over a run is an
    arithmetic series — no per-pixel reduction at all), then aggregate
    runs per component with one small sort + segmented scans. The only
    full-image-sized op is the run-compaction sort — measured ~15x faster
    than per-stat segment_sum ops on v5e, where scatter-based keyed
    reductions cost ~6 ns/element vs ~0.6 for sort. `max_runs` must be
    >= the true run count (compare Components.count drop / Runs.count)."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    g_root, g_s, g_e, run_count = _sorted_run_table(labels, max_runs)
    gvalid = g_root < n
    y = jnp.where(gvalid, (g_s // w).astype(jnp.float32), 0.0)
    g_x0 = jnp.where(gvalid, (g_s % w).astype(jnp.float32), 0.0)
    g_x1 = jnp.where(gvalid, (g_e % w).astype(jnp.float32), 0.0)
    g_ln = jnp.where(gvalid, g_x1 - g_x0 + 1.0, 0.0)
    # closed-form per-run moment contributions

    def s1(a, b):          # sum_{x=a..b} x
        return (a + b) * (b - a + 1.0) * 0.5

    def s2(b):             # sum_{x=0..b} x^2
        return b * (b + 1.0) * (2.0 * b + 1.0) / 6.0

    g_sumx = jnp.where(gvalid, s1(g_x0, g_x1), 0.0)
    g_sumxx = jnp.where(gvalid, s2(g_x1) - s2(g_x0 - 1.0), 0.0)
    g_sumy = y * g_ln
    g_sumxy = y * g_sumx
    g_sumyy = y * y * g_ln
    g_y = y
    new = jnp.concatenate([jnp.ones((1,), bool), g_root[1:] != g_root[:-1]])
    # ONE associative scan carries all ten per-component stats (round 2 ran
    # ten separate scans — ~3.7 ms of redundant passes at 262k runs,
    # measured on-chip 2026-08-19)
    (area, sx, sy, sxx, sxy, syy, bx0, by0, bx1, by1) = _seg_scan_multi(
        sums=(g_ln, g_sumx, g_sumy, g_sumxx, g_sumxy, g_sumyy),
        mins=(jnp.where(gvalid, g_x0, w), jnp.where(gvalid, g_y, h)),
        maxs=(jnp.where(gvalid, g_x1, -1.0), jnp.where(gvalid, g_y, -1.0)),
        new=new)
    is_end = jnp.concatenate([new[1:], jnp.ones((1,), bool)])
    key = jnp.where(is_end & gvalid, area, 0.0)
    k = min(max_components, max_runs)
    top_area, pos = _topk_by_area(key, k, n)
    if k < max_components:
        top_area = jnp.pad(top_area, (0, max_components - k))
        pos = jnp.pad(pos, (0, max_components - k))
    valid = top_area > 0
    safe_area = jnp.maximum(top_area, 1.0)
    roots = g_root[pos]
    boxes = jnp.stack([bx0[pos], by0[pos], bx1[pos], by1[pos]], axis=1)
    cent = jnp.stack([sx[pos] / safe_area, sy[pos] / safe_area], axis=1)
    mom = jnp.stack([top_area, sx[pos], sy[pos],
                     sxx[pos], sxy[pos], syy[pos]], axis=1)
    return Components(
        boxes=jnp.where(valid[:, None], boxes, 0).astype(jnp.int32),
        areas=jnp.where(valid, top_area, 0).astype(jnp.int32),
        centroids=jnp.where(valid[:, None], cent, 0.0),
        roots=jnp.where(valid, roots, -1).astype(jnp.int32),
        count=jnp.sum(valid).astype(jnp.int32),
        moments=jnp.where(valid[:, None], mom, 0.0),
        run_count=run_count,
        total_components=jnp.sum(new & gvalid).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("max_components", "max_runs"))
def extract_boxes(labels: jax.Array, max_components: int = 4096,
                  max_runs: int = 262144) -> BoxTable:
    """Bounding boxes + areas of ALL components, in root order — the
    workload the reference's ccl-extract benchmark times
    (speed_compare:163-168: boxes-only from the LEA run table; no
    centroids, no moments, no sorting by area). `extract_components`
    remains the full-statistics path.

    Cost vs extract_components: the segmented scan carries 5 stats
    instead of 10, and the area-ranked top-K (histogram cutoff + two
    small sorts) is replaced by a first-K-in-order selection (ties on a
    0/1 key resolve by index, so `cutoff_topk_flat` compacts the
    component ends in root order directly)."""
    h, w = labels.shape
    n = h * w
    max_runs = min(max_runs, n)     # capacity cannot exceed pixel count
    g_root, g_s, g_e, run_count = _sorted_run_table(labels, max_runs)
    gvalid = g_root < n
    y = jnp.where(gvalid, (g_s // w).astype(jnp.float32), 0.0)
    g_x0 = jnp.where(gvalid, (g_s % w).astype(jnp.float32), 0.0)
    g_x1 = jnp.where(gvalid, (g_e % w).astype(jnp.float32), 0.0)
    g_ln = jnp.where(gvalid, g_x1 - g_x0 + 1.0, 0.0)
    new = jnp.concatenate([jnp.ones((1,), bool), g_root[1:] != g_root[:-1]])
    (area, bx0, by0, bx1, by1) = _seg_scan_multi(
        sums=(g_ln,),
        mins=(jnp.where(gvalid, g_x0, w), jnp.where(gvalid, y, h)),
        maxs=(jnp.where(gvalid, g_x1, -1.0), jnp.where(gvalid, y, -1.0)),
        new=new)
    is_end = jnp.concatenate([new[1:], jnp.ones((1,), bool)]) & gvalid
    from ..kernels.dispatch import pallas_enabled
    from ..kernels import nz_compact
    if (pallas_enabled() and max_runs <= nz_compact.MAX_N
            and w <= 2047 and h <= 2047):
        # collect the component-end rows with ONE multi-payload butterfly
        # pass (kernels/nz_compact.py): the gather-based collection cost
        # ~6 ns/element x K x 7 arrays (~1.7 ms at 25k components,
        # profiled 2026-08-20). Bbox corners pack 2-per-i32 (< 2048 each)
        # to halve the payload count.
        bxp = (bx0 * 2048.0 + bx1).astype(jnp.int32)
        byp = (by0 * 2048.0 + by1).astype(jnp.int32)
        (roots_c, area_c, bxp_c, byp_c), total = nz_compact.nonzero_compact(
            is_end, (g_root, area.astype(jnp.int32), bxp, byp),
            max_components)
        count = jnp.minimum(total, max_components)
        valid = jnp.arange(max_components, dtype=jnp.int32) < count
        boxes = jnp.stack([bxp_c // 2048, byp_c // 2048,
                           bxp_c % 2048, byp_c % 2048], axis=1)
        return BoxTable(
            boxes=jnp.where(valid[:, None], boxes, 0),
            areas=jnp.where(valid, area_c, 0),
            roots=jnp.where(valid, roots_c, -1),
            count=count,
            run_count=run_count,
            total_components=total,
        )
    # first max_components ends in index (== root) order: all keys are 1,
    # cutoff selection resolves ties by ascending index — a compaction
    from .fast import cutoff_topk_flat
    picked, pos = cutoff_topk_flat(
        is_end.astype(jnp.uint8), max_components)
    boxes = jnp.stack([bx0[pos], by0[pos], bx1[pos], by1[pos]], axis=1)
    return BoxTable(
        boxes=jnp.where(picked[:, None], boxes, 0).astype(jnp.int32),
        areas=jnp.where(picked, area[pos], 0).astype(jnp.int32),
        roots=jnp.where(picked, g_root[pos], -1).astype(jnp.int32),
        count=jnp.sum(picked).astype(jnp.int32),
        run_count=run_count,
        total_components=jnp.sum(is_end).astype(jnp.int32),
    )


def _topk_by_area(key: jax.Array, k: int, n_px: int):
    """Exact lax.top_k replacement for integer-valued f32 area keys:
    (top_area, pos), value desc / index asc — without the full sort
    top_k lowers to (~0.3-0.5 ms at 262k on v5e, XLA-TPU trap #4).

    Areas are integers, so selection on min(area, 255) is exact for every
    component below the clamp, and the clamp bucket is PROVABLY small:
    a component with area >= 255 owns >= 255 pixels, so there are at most
    n_px/255 of them. When more than k exist (cutoff inside the clamp
    bucket), a lax.cond switches to compacting just that bucket and
    sorting its true areas — bounded by `cap`, never the full table. A
    final k-element sort restores top_k's (value desc, index asc) output
    order in all cases."""
    from .fast import cutoff_topk_flat
    from ..ops import compaction
    nk = key.shape[0]
    key_u8 = jnp.minimum(key, 255.0).astype(jnp.uint8)
    picked_a, pos_a = cutoff_topk_flat(key_u8, k)
    cap = max(k, min(nk, -(-n_px // 255) + 1))
    iota = jnp.arange(nk, dtype=jnp.int32)

    def small(_):
        return picked_a, pos_a

    def big(_):
        # > k components at the 255 clamp: order needs true areas
        np_ = -(-nk // 128) * 128
        key2 = jnp.pad(key, (0, np_ - nk)).reshape(-1, 128)
        iota2 = jnp.pad(iota, (0, np_ - nk)).reshape(-1, 128)
        (v, i), ok, _ = compaction.compact(key2 >= 255.0, (key2, iota2),
                                           cap)
        sv = jnp.where(ok, -v, jnp.inf)
        si = jnp.where(ok, i, nk)
        sv, si = jax.lax.sort((sv, si), num_keys=2)
        return jnp.isfinite(sv[:k]), jnp.where(jnp.isfinite(sv[:k]),
                                               si[:k], 0)

    picked, pos = jax.lax.cond(
        jnp.sum((key >= 255.0).astype(jnp.int32)) > k, big, small, None)
    top_area = jnp.where(picked, key[pos], 0.0)
    # restore top_k output order (desc area, asc index; empties last)
    neg, pos = jax.lax.sort(
        (jnp.where(picked, -top_area, jnp.inf),
         jnp.where(picked, pos, nk)), num_keys=2)
    picked = jnp.isfinite(neg)
    return jnp.where(picked, -neg, 0.0), jnp.where(picked, pos, 0)


def _sorted_run_table(labels: jax.Array, max_runs: int):
    """Root-sorted run table straight from the dense label map: (g_root,
    g_s, g_e) each (max_runs,), sorted ascending by component root, plus
    the TRUE run count.

    Round 2 first compacted run starts (butterfly + global placement +
    three 262k gathers) and then sorted — but the on-chip profile
    (2026-08-19) showed placement + gathers cost ~14 ms while a
    megapixel 3-operand lax.sort is ~1 ms on v5e: sorting the FULL map
    with sentinel keys (invalid pixels key = n, ordering after every real
    root) and slicing the first max_runs slots is both simpler and ~10x
    faster. The slice is exact: valid runs sort before all sentinels.

    Round 4: on the Pallas path the full-map sort itself (measured
    3.06 ms — it was the other half of the ccl_extract loss) is replaced
    by kernels/run_compact.py: a VMEM butterfly compacts the ~100k real
    starts into aligned blocks and the sort runs on max_runs + slack
    elements x 2 operands instead of h*w x 3."""
    h, w = labels.shape
    n = h * w
    from ..kernels.dispatch import pallas_enabled
    from ..kernels import run_compact as rc
    if pallas_enabled() and rc.pack_fits(h, w):
        wp = -(-(w + 1) // 128) * 128
        lbl_p = jnp.pad(labels, ((0, 0), (0, wp - w)), constant_values=n)
        g_root, g_s, g_ln, run_count = rc.run_table_compact(
            lbl_p, n, w, wp, max_runs)
        return g_root, g_s, g_s + g_ln - 1, run_count
    fg = labels < n
    left = jnp.pad(fg, ((0, 0), (1, 0)))[:, :w]
    start = fg & ~left

    def op(a, b):          # suffix run-length scan, resets at background
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av + bv), af | bf)

    runlen, _ = jax.lax.associative_scan(
        op, (fg.astype(jnp.int32), ~fg), axis=1, reverse=True)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    key = jnp.where(start, labels, n).reshape(-1)
    s = jnp.where(start, idx, n).reshape(-1)
    ln = jnp.where(start, runlen, 1).reshape(-1)
    g_root, g_s, g_ln = jax.lax.sort((key, s, ln), num_keys=1)
    m = min(max_runs, n)
    g_root, g_s, g_ln = g_root[:m], g_s[:m], g_ln[:m]
    if m < max_runs:
        pad = max_runs - m
        g_root = jnp.pad(g_root, (0, pad), constant_values=n)
        g_s = jnp.pad(g_s, (0, pad), constant_values=n)
        g_ln = jnp.pad(g_ln, (0, pad), constant_values=1)
    g_e = g_s + g_ln - 1
    run_count = jnp.sum(start).astype(jnp.int32)
    return g_root, g_s, g_e, run_count


def _run_table(labels: jax.Array, max_runs: int):
    """Compact the per-row runs of a labeled image into (start, end)
    linear-index arrays of static size `max_runs`: run length is computed
    per start pixel by a reverse segmented row scan (elementwise), then
    the sparse start pixels are extracted with the butterfly compaction
    (ops/compaction.py) — scan order IS start-index order, so this equals
    the old full-image (start_key, len) sort at ~1/15 the cost.
    Returns (s, e, valid, true_count)."""
    from ..ops import compaction
    h, w = labels.shape
    n = h * w
    fg = labels < n
    left = jnp.pad(fg, ((0, 0), (1, 0)))[:, :w]
    start = fg & ~left

    def op(a, b):          # suffix run-length scan, resets at background
        av, af = a
        bv, bf = b
        return (jnp.where(bf, bv, av + bv), af | bf)

    runlen, _ = jax.lax.associative_scan(
        op, (fg.astype(jnp.int32), ~fg), axis=1, reverse=True)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    (s, ln), valid, count = compaction.compact(
        start, (idx, runlen), min(max_runs, n))
    if s.shape[0] < max_runs:
        pad = max_runs - s.shape[0]
        s = jnp.pad(s, (0, pad))
        ln = jnp.pad(ln, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    e = jnp.where(valid, s + ln - 1, n)
    return (jnp.where(valid, s, n), e, valid, count)


@functools.partial(jax.jit, static_argnames=("max_runs",))
def extract_runs(labels: jax.Array, max_runs: int = 4096) -> Runs:
    """Per-row run-length segments of the labeled image (reference LSL's
    RLC/RLE result, core/ccl/compv_core_ccl_lsl_result.cxx): each
    maximal horizontal run of one component yields (y, x0, x1, root),
    sorted top->down then left->right, truncated at `max_runs` (compare
    `count` against it to detect truncation)."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    s, e, valid, count = _run_table(labels, max_runs)
    root = jnp.where(valid, flat[jnp.minimum(s, n - 1)], -1)
    return Runs(
        y=jnp.where(valid, s // w, -1).astype(jnp.int32),
        x0=jnp.where(valid, s % w, -1).astype(jnp.int32),
        x1=jnp.where(valid, e % w, -1).astype(jnp.int32),
        root=root.astype(jnp.int32),
        count=count,
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def extract_blob_points(labels: jax.Array, roots: jax.Array,
                        cap: int = 1024) -> BlobPoints:
    """Pixel lists of the components whose root ids are in `roots` (C,)
    (reference extract(COMPV_CCL_EXTRACT_TYPE_BLOB), lsl_result.cxx).
    One global sort groups each component's pixels contiguously; per-blob
    windows are then gathered at the component offsets — no per-blob
    image passes. Invalid roots (-1) yield count 0."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    order_key = jnp.where(flat < n, flat, n)
    sorted_lab, sorted_idx = jax.lax.sort(
        (order_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    # first occurrence offset of each root via searchsorted on the sorted
    # labels; counts from the matching range end
    roots = roots.astype(jnp.int32)
    safe = jnp.maximum(roots, 0)
    lo = jnp.searchsorted(sorted_lab, safe)
    hi = jnp.searchsorted(sorted_lab, safe, side="right")
    counts = jnp.where(roots >= 0, hi - lo, 0).astype(jnp.int32)

    def one(lo_k, cnt_k):
        pos = lo_k + jnp.arange(cap, dtype=jnp.int32)
        ok = jnp.arange(cap) < cnt_k
        pix = sorted_idx[jnp.minimum(pos, n - 1)]
        x = jnp.where(ok, pix % w, -1)
        y = jnp.where(ok, pix // w, -1)
        return jnp.stack([x, y], axis=1)

    xy = jax.vmap(one)(lo, counts)
    return BlobPoints(xy=xy.astype(jnp.int32), counts=counts)


@jax.jit
def remove_components(labels: jax.Array, roots: jax.Array) -> jax.Array:
    """Erase the components whose root ids are in `roots` (C,) — the
    reference's CompVConnectedComponentCallbackRemoveLabel path
    (compv_ccl.h:151). Entries of -1 are ignored. Returns new labels with
    those components set to background."""
    h, w = labels.shape
    n = h * w
    # flag table indexed by root id (a broadcast compare would materialize
    # an (H, W, C) boolean — hundreds of MB at HD shapes)
    table = jnp.zeros(n + 1, bool).at[
        jnp.where(roots >= 0, roots, n)].set(roots >= 0)
    kill = table[jnp.minimum(labels, n)]
    return jnp.where(kill, jnp.int32(n), labels)


@functools.partial(jax.jit, static_argnames=("max_components",))
def flatten_labels(labels: jax.Array, max_components: int = 256
                   ) -> jax.Array:
    """Dense relabeling: top-K components get ids 1..K by decreasing area,
    background/others 0 (reference debugFlatten, compv_ccl.h:121 — there
    marked not-implemented; useful for visualization)."""
    comps = extract_components(labels, max_components)
    h, w = labels.shape
    dense = jnp.zeros(h * w + 1, jnp.int32)
    ids = jnp.arange(1, max_components + 1, dtype=jnp.int32)
    dense = dense.at[jnp.where(comps.roots >= 0, comps.roots, h * w)].set(
        jnp.where(comps.roots >= 0, ids, 0))
    return dense[jnp.minimum(labels, h * w)]


@register("ccl", "propagate")
def make_ccl(connectivity: int = 8):
    """Factory (reference COMPV_PLSL_ID)."""

    def run(binary: jax.Array):
        lbl = label(binary, connectivity)
        return lbl, extract_components(lbl)

    return run
