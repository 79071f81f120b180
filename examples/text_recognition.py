"""Text-region detection demo: CCL glyph components + MSER regions.

Analogue of the reference's samples/text_recognition and
samples/connected_component_labeling / samples/mser (adaptive threshold ->
PLSL CCL boxes; LMSER stable extremal regions), all compute on TPU.

Usage:
  python examples/text_recognition.py [input.png [out_prefix]]
With no arguments a synthetic text-like page is generated.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from compv_tpu.features import ccl
from compv_tpu.features.mser import mser, MSERConfig
from compv_tpu.io import image as image_io
from compv_tpu.ops import threshold
from compv_tpu import viz


def synthetic_page(seed=0, h=360, w=480):
    """Dark glyph-like strokes arranged in text lines on a bright page."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 215, np.float64)
    for row in range(24, h - 24, 28):            # text lines
        x = 20
        while x < w - 30:
            gw = int(rng.integers(8, 22))        # glyph width
            if rng.random() < 0.82:              # else: word space
                sub = (np.add.outer((np.arange(16) // 3) % 3 != 0,
                                    np.zeros(gw, bool))
                       & ((np.add.outer(np.arange(16) // 7 * 3,
                                        np.arange(gw) // 2)) % 5 < 2))
                img[row:row + 16, x:x + gw][sub] = 40
            x += gw + 4
    img += rng.normal(0, 4, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv):
    img = (image_io.imread(argv[1], gray=True) if len(argv) > 1
           else synthetic_page())
    prefix = argv[2] if len(argv) > 2 else "text"
    x = jnp.asarray(img)

    # dark text on bright page -> invert, Otsu, CCL, component boxes
    binary = threshold.otsu_threshold(255 - x)[1]
    labels = ccl.label(binary)
    comps = ccl.extract_components(labels, max_components=1024)
    n = int(comps.count)
    boxes = np.asarray(comps.boxes)[:n]
    areas = np.asarray(comps.areas)[:n]
    keep = (areas >= 12) & (areas <= 2000)       # glyph-sized blobs
    canvas = viz.draw_boxes(img, boxes[keep])
    p = f"{prefix}_ccl.png"
    image_io.imwrite(p, canvas)
    print(f"ccl: {n} components, {int(keep.sum())} glyph-sized -> {p}")

    # glyph components are tens of pixels: lower the area floor from the
    # default 0.05% of the image (86 px here) to 0.01%
    regions = mser(x, MSERConfig(max_regions=256, min_area=1e-4))
    rn = int(regions.count)
    rboxes = np.asarray(regions.boxes)[np.asarray(regions.valid)]
    canvas2 = viz.draw_boxes(img, rboxes, color=(200, 60, 60))
    p2 = f"{prefix}_mser.png"
    image_io.imwrite(p2, canvas2)
    print(f"mser: {rn} stable regions -> {p2}")


if __name__ == "__main__":
    main(sys.argv)
