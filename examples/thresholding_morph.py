"""Thresholding + morphology demo: Otsu, adaptive mean-C, open/close.

Analogue of the reference's samples/thresh_otsu, samples/thresh_adaptive
and samples/morph_ops (CompVImage::thresholding* + CompVMathMorph), all
compute on TPU.

Usage:
  python examples/thresholding_morph.py [input.png [outdir]]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from compv_tpu.io import image as image_io
from compv_tpu.ops import morphology, threshold


def synthetic(seed=0):
    rng = np.random.default_rng(seed)
    h, w = 360, 480
    yy, xx = np.mgrid[0:h, 0:w]
    # text-like glyph strokes over an illumination gradient (the adaptive
    # threshold's reason to exist)
    glyphs = (((yy // 4) % 3 != 0) & ((xx // 3 + (yy // 9) * 2) % 6 < 2))
    img = 170 - 90.0 * (xx / w) + np.where(glyphs, -70.0, 0.0)
    img += rng.normal(0, 5, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv):
    img = (image_io.imread(argv[1], gray=True) if len(argv) > 1
           else synthetic())
    outdir = argv[2] if len(argv) > 2 else "."
    x = jnp.asarray(img)

    t, otsu = threshold.otsu_threshold(x)
    image_io.imwrite(os.path.join(outdir, "thresh_otsu.png"),
                     np.asarray(otsu))
    print(f"otsu threshold={int(t)} fg={int((np.asarray(otsu) > 0).sum())}")

    adapt = threshold.threshold_adaptive(x, block_size=11, c=8.0)
    image_io.imwrite(os.path.join(outdir, "thresh_adaptive.png"),
                     np.asarray(adapt))
    print(f"adaptive fg={int((np.asarray(adapt) > 0).sum())}")

    se = morphology.structuring_element("cross", 3, 3)
    opened = morphology.open_(adapt, se)
    closed = morphology.close_(adapt, se)
    image_io.imwrite(os.path.join(outdir, "morph_open.png"),
                     np.asarray(opened))
    image_io.imwrite(os.path.join(outdir, "morph_close.png"),
                     np.asarray(closed))
    print(f"open fg={int((np.asarray(opened) > 0).sum())} "
          f"close fg={int((np.asarray(closed) > 0).sum())}")


if __name__ == "__main__":
    main(sys.argv)
