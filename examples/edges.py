"""Edge detection demo: Sobel / Scharr / Prewitt magnitude maps + Canny.

Analogue of the reference's samples/edges_sobel and samples/edges_canny
(CompVEdgeDete factories + CompVCannyDete), all compute on TPU.

Usage:
  python examples/edges.py [input.png [outdir]]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from compv_tpu import CannyConfig
from compv_tpu.features import canny as canny_mod
from compv_tpu.features.edges import edge_detect
from compv_tpu.io import image as image_io


def synthetic(seed=0):
    rng = np.random.default_rng(seed)
    h, w = 360, 480
    yy, xx = np.mgrid[0:h, 0:w]
    img = 120 + 70.0 * np.sin(xx / 23.0) + 50.0 * ((yy // 40) % 2)
    img += rng.normal(0, 4, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv):
    img = (image_io.imread(argv[1], gray=True) if len(argv) > 1
           else synthetic())
    outdir = argv[2] if len(argv) > 2 else "."
    x = jnp.asarray(img)
    for kind in ("sobel", "scharr", "prewitt"):
        e = np.asarray(edge_detect(x, kind))
        p = os.path.join(outdir, f"edges_{kind}.png")
        image_io.imwrite(p, e)
        print(f"{kind}: {int((e > 0).sum())} edge px -> {p}")
    c = np.asarray(canny_mod.canny(x, CannyConfig()))
    p = os.path.join(outdir, "edges_canny.png")
    image_io.imwrite(p, c)
    print(f"canny: {int((c > 0).sum())} edge px -> {p}")


if __name__ == "__main__":
    main(sys.argv)
