"""ORB: pyramid FAST detection + oriented BRIEF description.

Re-design of core/features/orb/compv_core_feature_orb_dete.cxx:46-359 and
compv_core_feature_orb_desc.cxx:100-560.

Reference pipeline (per level, fanned out over threads): scale from level 0
-> FAST -> selectBest(per-level budget) -> erase near border -> patch
moments m01/m10 -> atan2 orientation -> scale coords to level 0; describe:
Gaussian blur each level in place -> rotated BRIEF-256.

TPU re-design: levels are a static Python loop (8 different static shapes);
within a level everything is the dense tensor program from features/fast.py;
XLA overlaps independent levels. Per-level feature budgets follow the
reference exactly: budget(level) = max_features * sf**level / sum(sf**i)
(orb_dete.cxx:318-325), rounded up, as static ints.
"""
from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..core.config import FastType, OrbConfig
from ..core.registry import register
from ..core.types import Descriptors, Points, concat_points
from ..ops.convolve import gaussian_blur
from ..ops.mathutils import orientations
from ..ops.resize import build_pyramid, scale_factors_sum
from . import brief
from .fast import fast_nms, fast_strengths, strengths_to_points


def level_budgets(max_features: int, levels: int, sf: float) -> List[int]:
    """Per-level feature caps, reference semantics (orb_dete.cxx:318-325)."""
    sfs = scale_factors_sum(levels, sf)
    return [max(1, int(math.ceil(max_features * (sf ** lv) / sfs)))
            for lv in range(levels)]


def _erase_near_border(pts: Points, h: int, w: int, border: int) -> Points:
    """Invalidate points closer than `border` px to the level-image edge
    (reference eraseTooCloseToBorder, called with patch radius before
    moments/description)."""
    x, y = pts.xy[:, 0], pts.xy[:, 1]
    ok = ((x >= border) & (y >= border)
          & (x < w - border) & (y < h - border) & pts.valid)
    return Points(
        xy=pts.xy,
        strength=jnp.where(ok, pts.strength, -jnp.inf),
        angle=pts.angle,
        level=pts.level,
        size=pts.size,
        count=jnp.sum(ok).astype(jnp.int32),
    )


def _compact(pts: Points) -> Points:
    """Sort live entries first (strength desc) so padded slots trail."""
    order = jnp.argsort(-pts.strength, stable=True)
    return Points(xy=pts.xy[order], strength=pts.strength[order],
                  angle=pts.angle[order], level=pts.level[order],
                  size=pts.size[order], count=pts.count)


@functools.partial(jax.jit, static_argnames=("config",))
def orb_detect_describe(img: jax.Array, config: OrbConfig = OrbConfig()
                        ) -> Tuple[Points, Descriptors]:
    """Full ORB frontend on one grayscale image -> (points, descriptors).

    Points carry level-0 coordinates; descriptors are 256-bit packed uint32.
    """
    levels = config.levels
    sf = config.scale_factor
    n = 9 if config.fast.fast_type == FastType.FAST9 else 12
    radius = config.patch_diameter // 2
    budgets = level_budgets(config.max_features, levels, sf)
    pyr = build_pyramid(img, levels, sf)

    all_pts: List[Points] = []
    all_desc: List[jax.Array] = []
    from ..kernels.dispatch import pallas_enabled
    for lv in range(levels):
        level_img = pyr[lv]
        h, w = level_img.shape
        if pallas_enabled():
            # the fused strengths+NMS kernel (one HBM pass per level);
            # bit-identical to the jnp formulation below (kernel tests)
            from ..kernels.fast_kernel import fast_strengths_vmappable
            s = fast_strengths_vmappable(
                config.fast.threshold, n,
                config.fast.nonmax_suppression)(level_img)
        else:
            s = fast_strengths(level_img, config.fast.threshold, n)
            if config.fast.nonmax_suppression:
                s = fast_nms(s)
        pts = strengths_to_points(
            s, budgets[lv], level=lv,
            size=config.patch_diameter / (sf ** lv),
            nms_spaced=config.fast.nonmax_suppression)
        # border erase with the patch radius (moments need the full circle)
        pts = _erase_near_border(pts, h, w, radius)
        # orientation from circular patch moments on the *unblurred* level
        angle = orientations(level_img, pts.xy, radius)
        pts = Points(xy=pts.xy, strength=pts.strength, angle=angle,
                     level=pts.level, size=pts.size, count=pts.count)
        # describe on the blurred level (reference blurs each level in place,
        # orb_desc.cxx:186-204; we keep the pyramid immutable)
        blurred = gaussian_blur(level_img, config.blur_kernel_size,
                                config.blur_sigma)
        desc = brief.describe(blurred, pts, config.patch_diameter,
                              config.brief_bits, config.brief_seed,
                              pattern=config.brief_pattern)
        # scale coordinates back to level-0 frame (orb_dete.cxx:336-343)
        scale_back = 1.0 / (sf ** lv)
        pts = Points(xy=pts.xy * scale_back, strength=pts.strength,
                     angle=pts.angle, level=pts.level, size=pts.size,
                     count=pts.count)
        all_pts.append(pts)
        all_desc.append(desc.bits)

    merged = all_pts[0]
    for p in all_pts[1:]:
        merged = concat_points(merged, p)
    # descriptors must follow the same compaction order as concat_points:
    # rebuild by sorting on validity exactly like concat_points does.
    desc_bits = jnp.concatenate(all_desc)
    valid = jnp.concatenate([p.valid for p in all_pts])
    order = jnp.argsort(~valid, stable=True)
    desc_bits = desc_bits[order]
    descs = Descriptors(bits=desc_bits, count=merged.count)
    return merged, descs


@register("corner_detector", "orb")
@register("corner_descriptor", "orb")
def make_orb(config: OrbConfig = OrbConfig()):
    """Factory (reference COMPV_ORB_ID)."""

    def run(img: jax.Array):
        return orb_detect_describe(img, config)

    return run
