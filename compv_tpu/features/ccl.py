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
from typing import NamedTuple

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


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label(binary: jax.Array, connectivity: int = 8,
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
