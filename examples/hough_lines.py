"""Line detection demo: Canny edges -> Hough SHT and KHT -> rendered lines.

Analogue of the reference's samples/hough_lines (Canny + CompVHoughSht /
CompVHoughKht factories), all compute on TPU.

Usage:
  python examples/hough_lines.py [input.png [out_prefix]]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from compv_tpu import CannyConfig, HoughConfig
from compv_tpu.features import canny as canny_mod, hough_kht, hough_sht
from compv_tpu.io import image as image_io
from compv_tpu import viz


def synthetic(seed=0):
    rng = np.random.default_rng(seed)
    h, w = 360, 480
    img = np.full((h, w), 40, np.float64)
    # a few bright bars at different angles
    yy, xx = np.mgrid[0:h, 0:w]
    for a, b, c in ((1.0, -0.6, 30), (0.3, 1.0, -260), (1.0, 0.9, -420)):
        d = np.abs(a * xx + b * yy + c) / np.hypot(a, b)
        img[d < 2.5] = 220
    img += rng.normal(0, 4, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv):
    img = (image_io.imread(argv[1], gray=True) if len(argv) > 1
           else synthetic())
    prefix = argv[2] if len(argv) > 2 else "hough"
    h, w = img.shape
    edges = canny_mod.canny(jnp.asarray(img), CannyConfig())
    cfg = HoughConfig(threshold=120, max_lines=16)
    for name, fn in (("sht", hough_sht.hough_lines_sht),
                     ("kht", hough_kht.hough_lines_kht)):
        lines = fn(edges, cfg)
        if name == "kht":
            lines, gs = lines   # KHT also returns the global scale
            print(f"kht global scale GS={float(gs):.0f}")
        n = int(lines.count)
        segs = np.asarray(hough_sht.lines_to_cartesian(lines, w, h))[:n]
        canvas = viz.draw_lines(img, segs, thickness=2)
        p = f"{prefix}_{name}.png"
        image_io.imwrite(p, canvas)
        print(f"{name}: {n} lines -> {p}")


if __name__ == "__main__":
    main(sys.argv)
