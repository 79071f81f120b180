"""MSER — maximally stable extremal regions, threshold-sweep formulation.

Re-design of the reference's LMSER (core/ccl/compv_core_ccl_lmser.cxx, 531
LoC: linear-time component tree via union-find flood, with delta/variation/
min|max-area pruning). The union-find component tree is inherently
sequential; the TPU-native reformulation sweeps T threshold levels in
parallel (SURVEY §7 "threshold-sweep reformulation"):

  1. masks[t] = img <= level_t           (dark-on-bright; invert for bright)
  2. labels[t] = connected components     (features/ccl.py label propagation)
  3. area-per-pixel[t] = component size containing each pixel — because
     components only grow with t, the pixel's component chain IS the
     extremal-region evolution the component tree tracks
  4. variation[t] = (area[t+d] - area[t-d]) / area[t]   (same d=delta rule
     as lmser; region is stable where variation is a local minimum in t and
     below max_variation, with min/max area bounds)
  5. one seed per (level, component) = the pixel equal to its component's
     root index; top-K seeds by stability -> fixed-capacity region table.

Diversity pruning (lmser min_diversity) is approximated by the local-minimum
rule: one region per stability valley along each pixel chain.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.registry import register
from . import ccl


@dataclasses.dataclass(frozen=True)
class MSERConfig:
    delta: int = 1              # stability window, in level steps
    level_step: int = 8         # gray levels per threshold step
    min_area: float = 0.0005    # fraction of image area
    max_area: float = 0.25
    max_variation: float = 0.5
    max_regions: int = 64
    bright_on_dark: bool = False  # False: dark regions (img <= t)
    connectivity: int = 8


class MSERRegions(NamedTuple):
    levels: jax.Array      # (K,) int32 gray level of extraction
    areas: jax.Array       # (K,) int32
    boxes: jax.Array       # (K, 4) int32 x0, y0, x1, y1 inclusive
    centroids: jax.Array   # (K, 2) float32
    variations: jax.Array  # (K,) float32
    valid: jax.Array       # (K,) bool
    count: jax.Array       # () int32


@functools.partial(jax.jit, static_argnames=("config",))
def mser(img: jax.Array, config: MSERConfig = MSERConfig()) -> MSERRegions:
    """Detect MSER regions on a grayscale uint8 image."""
    h, w = img.shape
    n = h * w
    x = (255 - img) if config.bright_on_dark else img
    levels = jnp.arange(config.level_step - 1, 256, config.level_step,
                        dtype=jnp.int32)
    t_count = int(levels.shape[0])
    d = config.delta

    def _level_compute(mask, prev_lbl):
        # warm start from the previous (nested, smaller) level's labels:
        # roots are pixel indices that stay foreground as the mask grows,
        # so they are valid initial values — convergence in ~1 sweep/level
        lbl = ccl.label(mask.astype(jnp.uint8), config.connectivity,
                        init=prev_lbl)
        flat = lbl.reshape(-1)
        fg = flat < n
        seg = jnp.where(fg, flat, n)
        hist = jax.ops.segment_sum(fg.astype(jnp.int32), seg,
                                   num_segments=n + 1)
        area_pp = jnp.where(fg, hist[jnp.minimum(flat, n)], 0)
        return lbl, area_pp.reshape(h, w)

    def per_level(carry, lv):
        prev_mask, prev_lbl, prev_area = carry
        mask = x <= lv
        # skip unchanged levels entirely: on low-gray-count images (text
        # scans, the reference MSER workload class) most threshold steps
        # add NO pixels, and labeling + per-pixel areas are the whole cost
        lbl, area = jax.lax.cond(
            jnp.any(mask != prev_mask),
            lambda: _level_compute(mask, prev_lbl),
            lambda: (prev_lbl, prev_area))
        return (mask, lbl, area), (lbl, area)

    init = (jnp.zeros((h, w), bool), jnp.full((h, w), n, jnp.int32),
            jnp.zeros((h, w), jnp.int32))
    _, (labels, areas) = jax.lax.scan(per_level, init, levels)

    af = areas.astype(jnp.float32)
    lo = jnp.concatenate([jnp.repeat(af[:1], d, 0), af[:-d]])
    hi = jnp.concatenate([af[d:], jnp.repeat(af[-1:], d, 0)])
    variation = (hi - lo) / jnp.maximum(af, 1.0)     # (T,H,W)
    variation = jnp.where(areas > 0, variation, jnp.inf)

    # stability: local minimum of variation along t + thresholds
    v_prev = jnp.concatenate([jnp.full_like(variation[:1], jnp.inf),
                              variation[:-1]])
    v_next = jnp.concatenate([variation[1:],
                              jnp.full_like(variation[:1], jnp.inf)])
    min_a = max(int(config.min_area * n), 1)
    max_a = int(config.max_area * n)
    stable = ((variation <= v_prev) & (variation < v_next)
              & (variation <= config.max_variation)
              & (areas >= min_a) & (areas <= max_a))

    # one candidate per (level, component): the component-root pixel
    flat_idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    is_root = labels == flat_idx[None]
    score = jnp.where(stable & is_root, -variation, -jnp.inf)

    k = config.max_regions
    vals, idx = jax.lax.top_k(score.reshape(-1), k)
    valid = jnp.isfinite(vals)
    t_idx = idx // n
    root = idx % n

    # per-region features from its level's label map (K masked reductions)
    ys = (jnp.arange(n, dtype=jnp.int32) // w)
    xs = (jnp.arange(n, dtype=jnp.int32) % w)

    def region_feats(t, r):
        m = labels[t].reshape(-1) == r
        cnt = jnp.sum(m)
        x0 = jnp.min(jnp.where(m, xs, w))
        x1 = jnp.max(jnp.where(m, xs, -1))
        y0 = jnp.min(jnp.where(m, ys, h))
        y1 = jnp.max(jnp.where(m, ys, -1))
        c = jnp.maximum(cnt, 1).astype(jnp.float32)
        cx = jnp.sum(jnp.where(m, xs, 0)) / c
        cy = jnp.sum(jnp.where(m, ys, 0)) / c
        return cnt, jnp.stack([x0, y0, x1, y1]), jnp.stack([cx, cy])

    cnt, boxes, cents = jax.vmap(region_feats)(t_idx, root)
    return MSERRegions(
        levels=jnp.where(valid, levels[jnp.minimum(t_idx, t_count - 1)], 0),
        areas=jnp.where(valid, cnt, 0).astype(jnp.int32),
        boxes=jnp.where(valid[:, None], boxes, 0).astype(jnp.int32),
        centroids=jnp.where(valid[:, None], cents, 0.0),
        variations=jnp.where(valid, -vals, jnp.inf),
        valid=valid,
        count=jnp.sum(valid).astype(jnp.int32),
    )


@register("ccl", "mser")
def make_mser(config: MSERConfig = MSERConfig()):
    """Factory (reference COMPV_LMSER_ID)."""

    def run(img: jax.Array) -> MSERRegions:
        return mser(img, config)

    return run
