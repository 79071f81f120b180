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


@functools.partial(jax.jit, static_argnames=("max_components",))
def extract_components(labels: jax.Array, max_components: int = 256
                       ) -> Components:
    """Boxes/areas/centroids of the top-K components by area (reference
    CompVConnectedComponentLabelingResultLSL extract)."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    ys = (jnp.arange(n, dtype=jnp.int32) // w)
    xs = (jnp.arange(n, dtype=jnp.int32) % w)
    fg = flat < n
    seg = jnp.where(fg, flat, n)  # background into the overflow bucket
    ones = fg.astype(jnp.int32)
    area = jax.ops.segment_sum(ones, seg, num_segments=n + 1)
    x0 = jax.ops.segment_min(jnp.where(fg, xs, w), seg, num_segments=n + 1)
    x1 = jax.ops.segment_max(jnp.where(fg, xs, -1), seg, num_segments=n + 1)
    y0 = jax.ops.segment_min(jnp.where(fg, ys, h), seg, num_segments=n + 1)
    y1 = jax.ops.segment_max(jnp.where(fg, ys, -1), seg, num_segments=n + 1)
    sx = jax.ops.segment_sum(jnp.where(fg, xs, 0).astype(jnp.float32), seg,
                             num_segments=n + 1)
    sy = jax.ops.segment_sum(jnp.where(fg, ys, 0).astype(jnp.float32), seg,
                             num_segments=n + 1)
    area_roots = area.at[n].set(0)  # drop background bucket
    k = min(max_components, n)
    top_area, roots = jax.lax.top_k(area_roots, k)
    if k < max_components:
        top_area = jnp.pad(top_area, (0, max_components - k))
        roots = jnp.pad(roots, (0, max_components - k))
    valid = top_area > 0
    safe_area = jnp.maximum(top_area, 1).astype(jnp.float32)
    boxes = jnp.stack([x0[roots], y0[roots], x1[roots], y1[roots]], axis=1)
    cent = jnp.stack([sx[roots] / safe_area, sy[roots] / safe_area], axis=1)
    return Components(
        boxes=jnp.where(valid[:, None], boxes, 0).astype(jnp.int32),
        areas=jnp.where(valid, top_area, 0).astype(jnp.int32),
        centroids=jnp.where(valid[:, None], cent, 0.0),
        roots=jnp.where(valid, roots, -1).astype(jnp.int32),
        count=jnp.sum(valid).astype(jnp.int32),
    )


@register("ccl", "propagate")
def make_ccl(connectivity: int = 8):
    """Factory (reference COMPV_PLSL_ID)."""

    def run(binary: jax.Array):
        lbl = label(binary, connectivity)
        return lbl, extract_components(lbl)

    return run
