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


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def label(binary: jax.Array, connectivity: int = 8,
          max_iters: int = 4096) -> jax.Array:
    """(H, W) int32 labels: foreground pixels share their component root's
    linear index; background = H*W (sentinel)."""
    h, w = binary.shape
    fg = binary > 0
    big = jnp.int32(h * w)
    init = jnp.where(fg, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), big)

    def body(state):
        lbl, _, it = state
        new = _neighbor_min(lbl, fg, connectivity)
        # pointer jump: follow the label one hop (path halving); the sentinel
        # self-points via a trailing entry
        flat = jnp.concatenate([new.reshape(-1), jnp.asarray([big])])
        jumped = flat[new.reshape(-1)].reshape(h, w)
        new = jnp.where(fg, jnp.minimum(new, jumped), big)
        changed = jnp.any(new != lbl)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lbl, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
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
