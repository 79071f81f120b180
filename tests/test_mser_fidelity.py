"""MSER fidelity vs a reference-faithful oracle (round-2 VERDICT item 7).

The oracle re-implements the LMSER component-tree semantics
(core/ccl/compv_core_ccl_lmser.cxx — linear-time union-find tree over gray
levels) independently in NumPy/SciPy: per-level connected components via
scipy.ndimage.label (union-find), component chains followed through a
representative pixel, variation = (|R_{t+d}| - |R_{t-d}|) / |R_t|,
stability = local variation minimum along the chain + max_variation and
area bounds. This is the exact per-graylevel (level_step=1) tree the
reference builds; features/mser.py approximates it with a level_step-8
sweep by default.

Measured fidelity (pinned below) justifies the default: at level_step=1
our sweep reproduces the oracle regions almost exactly; at level_step=8
region recall stays high on text-like imagery because glyph components
are stable across wide level ranges.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from compv_tpu.features.mser import mser, MSERConfig

H, W = 128, 160
_EIGHT = np.ones((3, 3), np.int32)


def _text_image(seed=3):
    """Glyph-like blobs on bright paper, quantized to few gray levels so
    the level sweep is cheap and the component tree is non-trivial."""
    rng = np.random.default_rng(seed)
    img = np.full((H, W), 230, np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(26):
        cy, cx = rng.integers(12, H - 12), rng.integers(12, W - 12)
        hh, ww = rng.integers(3, 9), rng.integers(3, 12)
        shade = rng.choice([20, 60, 100])
        blob = (np.abs(yy - cy) <= hh) & (np.abs(xx - cx) <= ww)
        img[blob] = np.minimum(img[blob], shade)
    # per-pixel noise makes level boundaries fuzzy: component shapes now
    # genuinely differ between adjacent gray levels, so the 8-step sweep
    # is a real approximation of the per-level tree, not a free ride
    img = np.clip(img.astype(int) + rng.integers(-6, 7, (H, W)), 0,
                  255).astype(np.uint8)
    return img


def lmser_oracle(img, delta=8, min_area=9, max_area_frac=0.25,
                 max_variation=0.5, max_regions=64):
    """NumPy/SciPy LMSER: exact per-graylevel component tree."""
    h, w = img.shape
    n = h * w
    labs, areamaps, varmaps = [], [], []
    for t in range(256):
        lab, _ = ndimage.label(img <= t, structure=_EIGHT)
        counts = np.bincount(lab.ravel())
        labs.append(lab)
        amap = counts[lab]
        amap[lab == 0] = 0
        areamaps.append(amap)
    for t in range(256):
        tp, tm = min(t + delta, 255), max(t - delta, 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = (areamaps[tp] - areamaps[tm]) / np.maximum(areamaps[t], 1)
        v = np.where(areamaps[t] > 0, v, np.inf)
        varmaps.append(v)
    regions = []
    max_area = int(max_area_frac * n)
    for t in range(256):
        lab = labs[t]
        k = lab.max()
        if k == 0:
            continue
        # representative pixel (first in scan order) per component
        flat = lab.ravel()
        first = np.full(k + 1, -1, np.int64)
        idx = np.flatnonzero(flat)
        # reversed so earliest index wins
        first[flat[idx[::-1]]] = idx[::-1]
        for c in range(1, k + 1):
            p = first[c]
            y, x = divmod(p, w)
            a = areamaps[t][y, x]
            if not (min_area <= a <= max_area):
                continue
            v = varmaps[t][y, x]
            v_prev = varmaps[t - 1][y, x] if t > 0 else np.inf
            v_next = varmaps[t + 1][y, x] if t < 255 else np.inf
            if v <= v_prev and v < v_next and v <= max_variation:
                mask = lab == c
                regions.append((t, v, a, mask))
    regions.sort(key=lambda r: r[1])
    return regions[:max_regions]


def _our_masks(img, cfg):
    res = mser(jnp.asarray(img), cfg)
    out = []
    nres = int(res.count)
    for i in range(nres):
        lvl = int(res.levels[i])
        root = int(res.roots[i])
        y, x = divmod(root, W)
        lab, _ = ndimage.label(img <= lvl, structure=_EIGHT)
        out.append((lvl, lab == lab[y, x]))
    return out


def _best_iou(mask, others):
    best = 0.0
    for _, m in others:
        inter = np.logical_and(mask, m).sum()
        if inter == 0:
            continue
        union = np.logical_or(mask, m).sum()
        best = max(best, inter / union)
    return best


class TestMserFidelity:
    @pytest.mark.parametrize("step,min_recall,min_mean_iou", [
        (1, 0.9, 0.9),     # exact sweep: near-perfect tree agreement
        (8, 0.8, 0.8),     # default: documented fidelity of the 8-step
    ])
    def test_region_agreement_vs_oracle(self, step, min_recall,
                                        min_mean_iou):
        img = _text_image()
        n = H * W
        oracle = lmser_oracle(img, delta=8, min_area=9,
                              max_area_frac=0.25, max_variation=0.5)
        assert len(oracle) >= 10      # non-trivial tree
        cfg = MSERConfig(delta=max(1, 8 // step), level_step=step,
                         min_area=9 / n, max_area=0.25,
                         max_variation=0.5, max_regions=64)
        ours = _our_masks(img, cfg)
        assert len(ours) >= 5
        # recall: fraction of oracle regions some our-region overlaps well
        hits = sum(1 for _, _, _, m in oracle
                   if _best_iou(m, ours) >= 0.6)
        recall = hits / len(oracle)
        ious = [
            max((np.logical_and(m, om).sum()
                 / max(np.logical_or(m, om).sum(), 1))
                for _, _, _, om in oracle)
            for _, m in ours]
        mean_iou = float(np.mean(ious))
        print(f"\n  level_step={step}: oracle={len(oracle)} ours={len(ours)}"
              f" recall={recall:.2f} mean_best_iou={mean_iou:.2f}")
        assert recall >= min_recall, (recall, len(oracle), len(ours))
        assert mean_iou >= min_mean_iou, mean_iou
